"""Jet GAN training entry point (train.py:27-97).

    python -m mpgan_tpu.cli.train --name run1 --model mpgan --jets g
"""

from __future__ import annotations

import logging
import sys


def _reload_args_on_resume(args):
    """When resuming an existing run, the saved args card is authoritative
    (setup_training.py:1164-1177): everything is reloaded from
    ``<name>_args.txt`` except ``num_epochs`` and — a path-robustness delta
    vs the reference, which stores absolute paths in the card —
    ``dir_path``/``datasets_path``. ``--override-args`` keeps the CLI args."""
    import pathlib

    from ..training import checkpoint as ckpt
    from ..training.config import from_args_dict, from_args_txt

    if not args.get("load_model", True) or args.get("override_args"):
        return args
    out_dir = pathlib.Path(args.dir_path or "outputs") / args.name
    card = out_dir / f"{args.name}_args.txt"
    if not card.exists() or ckpt.latest_epoch(out_dir / "models") == 0:
        return args
    loaded = from_args_txt(str(card)).to_dict()
    loaded.update(
        num_epochs=args.num_epochs,
        dir_path=args.dir_path,
        datasets_path=args.datasets_path,
        load_model=True,
        name=args.name,
    )
    logging.info(f"resuming: reloaded args from {card}")
    return from_args_dict(loaded, apply_processing=False)


def main(argv: list[str] | None = None) -> None:
    from . import pin_platform

    pin_platform()
    from ..cli.args import parse_cli
    from ..data.jetnet import JetNetDataset
    from ..training.loop import Trainer

    from ..utils.logging_utils import init_logging

    args = parse_cli(argv)
    init_logging(args.log, args.log_file)  # before load_args, like the reference
    args = _reload_args_on_resume(args)

    data_kwargs = dict(
        jet_type=args.jets,
        data_dir=args.datasets_path or None,
        num_particles=args.num_hits,
        split_fraction=(args.ttsplit, 1 - args.ttsplit),
        mask_feature=args.get("mask", False),
        num_particles_label=bool(args.clabels or args.get("mask_c") or args.get("gapt_mask")),
        # --num-samples bounds the synthetic stand-in dataset (the real
        # HDF5 path always loads the full file, like the reference)
        synthetic_num_jets=args.num_samples,
    )
    train_ds = JetNetDataset(**data_kwargs, split="train")
    valid_ds = JetNetDataset(**data_kwargs, split="valid")
    logging.info(f"data loaded: train {len(train_ds)}, valid {len(valid_ds)}")

    fpnd_fn = None
    if args.get("fpnd"):
        try:
            from ..evaluation.fpnd import make_fpnd_fn

            # pass a jetnet pnet_state_dict.pt path via --datasets-path
            # convention <datasets>/pnet_state_dict.pt if present
            import pathlib as _pl

            wpath = None
            if args.datasets_path:
                cand = _pl.Path(args.datasets_path) / "pnet_state_dict.pt"
                wpath = str(cand) if cand.exists() else None
            fpnd_fn = make_fpnd_fn(wpath)
        except Exception as exc:  # pre-trained ParticleNet weights unavailable
            logging.warning(f"FPND unavailable: {exc}")

    trainer = Trainer(args, train_dataset=train_ds, valid_dataset=valid_ds, fpnd_fn=fpnd_fn)
    trainer.train()


if __name__ == "__main__":
    main(sys.argv[1:])
