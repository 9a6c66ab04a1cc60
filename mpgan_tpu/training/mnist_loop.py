"""MNIST point-cloud GAN training (train_mnist.py) — the CPU-scale
prototyping workload.

Reuses the jet Trainer's engine (same jitted D/G steps) with the MNIST
evaluation: FID via the MoNet classifier every ``save_epochs``
(train_mnist.py:612-693), cloud-image rasters, and best-epoch tracking by
FID instead of FPD.
"""

from __future__ import annotations

import logging
import pathlib

import jax
import numpy as np

from ..evaluation.mnist_fid import get_fid
from ..utils import plotting
from . import checkpoint as ckpt
from .loop import Trainer
from .sampling import generate_multi_batch

logger = logging.getLogger(__name__)


class MNISTDatasetView:
    """Adapts MNISTGraphDataset to the Trainer's dataset interface."""

    def __init__(self, mnist_dataset):
        self.particle_data = np.asarray(mnist_dataset.X, np.float32)
        self.jet_data = None
        self.particle_normalisation = lambda x, inverse=False: x

    def __len__(self):
        return len(self.particle_data)


class MNISTTrainer(Trainer):
    def __init__(self, args, **kwargs):
        super().__init__(args, **kwargs)
        self.losses.setdefault("fid", [])
        self.eval_keys = ["fid"]
        self.resources_path = args.get("mnist_eval_resources") or None
        if self.resources_path and not pathlib.Path(self.resources_path).exists():
            logger.warning(f"MNIST eval resources not found at {self.resources_path}")
            self.resources_path = None

    def eval_save_plot(self, epoch: int) -> None:
        args = self.args
        ckpt.save_train_state(ckpt.checkpoint_path(self.models_dir, epoch), self.state)

        n_eval = args.get("fid_eval_samples", 8192)
        gen_clouds = generate_multi_batch(
            self.suite.g_apply, self.suite.g_cfg,
            self.state.g_params, self.state.g_state,
            self.suite.noise, jax.random.PRNGKey(epoch), n_eval, args.batch_size,
            mesh=self._mesh,
        )

        if self.resources_path is not None:
            fid = get_fid(
                gen_clouds, args.num_hits, args.mnist_num, self.resources_path,
                eval_size=n_eval,
            )
            self.losses["fid"].append(fid)
            logger.info(f"epoch {epoch}: FID = {fid:.3f}")

        ckpt.save_losses(self.losses, self.losses_dir)
        try:
            plotting.mnist_cloud_image(gen_clouds, f"{epoch}_clouds", str(self.figs_dir))
            if len(self.losses.get("fid", [])) > 1:
                plotting.plot_fid(self.losses["fid"], str(epoch), str(self.losses_dir))
            if len(self.losses["G"]) > 1:
                plotting.plot_losses(self.losses, args.loss, str(epoch), str(self.losses_dir))
        except Exception:
            logger.exception("plotting failed")

        # best epoch by FID (train_mnist.py:680-693)
        if self.losses.get("fid") and epoch > 0:
            if self.losses["fid"][-1] < self.best_epoch[-1][1]:
                self.best_epoch.append([epoch, self.losses["fid"][-1]])
                np.savetxt(self.out_dir / "best_epoch.txt", np.asarray(self.best_epoch))
                ckpt.save_train_state(self.out_dir / "state_best_epoch.npz", self.state)
