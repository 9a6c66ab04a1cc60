"""Sparsified-MNIST GAN training entry point (train_mnist.py:70-118).

    python -m mpgan_tpu.cli.train_mnist --name mnist3 --mnist-num 3 \\
        --num-hits 75 --mnist-eval-resources <path to evaluation_resources>

Masking is forced off (train_mnist.py:75-77); num-hits selects the
75/100-brightest-pixel variant.
"""

from __future__ import annotations

import logging
import sys


def main(argv: list[str] | None = None) -> None:
    from . import pin_platform

    pin_platform()
    from ..cli.args import parse_cli
    from ..data.mnist import MNISTGraphDataset
    from ..training.mnist_loop import MNISTDatasetView, MNISTTrainer

    args = parse_cli(argv)
    # MNIST path forces masking off (train_mnist.py:75-77)
    args.mask = False
    args.mask_c = False
    args.gapt_mask = False
    args.dataset = "mnist"
    if args.num_hits == 30:  # jet default; MNIST uses 75/100 pixels
        args.num_hits = 75
    if "mnist_eval_resources" not in args.__dict__:
        args.mnist_eval_resources = ""

    from ..utils.logging_utils import init_logging

    init_logging(args.log, args.log_file)

    data_dir = args.datasets_path or None
    train_ds = MNISTDatasetView(
        MNISTGraphDataset(data_dir, args.num_hits, train=True, num=args.mnist_num)
    )
    valid_ds = MNISTDatasetView(
        MNISTGraphDataset(data_dir, args.num_hits, train=False, num=args.mnist_num)
    )
    logging.info(f"MNIST clouds: train {len(train_ds)}, valid {len(valid_ds)}")

    trainer = MNISTTrainer(args, train_dataset=train_ds, valid_dataset=valid_ds)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
