"""Host-side training orchestration (train.py:812-985 + eval_save_plot
686-809): epoch loop, D/G interleave, periodic evaluation + checkpoint +
plots, best-epoch tracking, resume.

The device work is two jitted SPMD step functions (mpgan_tpu/training/
train_step.py); this module only shuffles batches, tracks metrics and talks
to the filesystem.
"""

from __future__ import annotations

import logging
import pathlib
import time
from typing import Any

import jax
import numpy as np

from ..data.jetnet import gen_jet_corrections
from ..data.loader import BatchLoader
from ..evaluation import cov_mmd, efps, fpd, w1efp, w1m, w1p
from ..models.registry import ModelSuite, build_suite
from ..ops.augment import AugmentConfig
from ..parallel.mesh import make_mesh, shard_map_step
from ..utils import plotting
from . import checkpoint as ckpt
from .config import Args
from .optimizers import build_optimizer
from .sampling import generate_multi_batch
from .train_step import StepConfig, init_train_state, make_train_steps

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        args: Args,
        suite: ModelSuite | None = None,
        train_dataset: Any = None,
        valid_dataset: Any = None,
        mesh=None,
        fpnd_fn=None,
    ):
        self.args = args
        self.suite = suite or build_suite(
            args, pcgan_weights_dir=args.get("pcgan_weights_dir") or None
        )
        self.train_dataset = train_dataset
        self.valid_dataset = valid_dataset
        self.fpnd_fn = fpnd_fn

        # NaN watchdog (SURVEY.md §5; old_model.py:363-416 checks every
        # intermediate for NaN inside the model). Per-op host checks inside a
        # jitted TPU program would force a sync per op, so the tpu-native
        # equivalent is jax's own nan debugger: every primitive's output is
        # checked at dispatch and the failing op is reported with its
        # traceback. Opt-in (it disables async dispatch). The always-on
        # epoch-level loss check lives in train_epoch.
        if args.get("debug_nans"):
            jax.config.update("jax_debug_nans", True)

        # directory scaffolding (setup_training.py:1086-1110)
        out_root = pathlib.Path(args.dir_path or "outputs")
        self.out_dir = out_root / args.name
        self.models_dir = self.out_dir / "models"
        self.losses_dir = self.out_dir / "losses"
        self.figs_dir = self.out_dir / "figs"
        # name-collision guard (setup_training.py:1088-1094): refuse to
        # overwrite an existing run unless resuming or explicitly overridden
        if (
            self.out_dir.exists()
            and args.name != "test"
            and not args.get("load_model", True)
            and not args.get("override_load_check")
        ):
            raise RuntimeError(
                "A model directory of this name already exists, either change "
                "the name or use the --override-load-check flag"
            )
        for d in (self.models_dir, self.losses_dir, self.figs_dir):
            d.mkdir(parents=True, exist_ok=True)

        # resume detection first (setup_training.py:1138-1152), because the
        # args card is written on fresh runs only — a resume must not clobber
        # the original card (setup_training.py:1159-1163)
        self.start_epoch = 0
        if args.get("load_model", True):
            self.start_epoch = ckpt.latest_epoch(self.models_dir)
        if self.start_epoch == 0:
            (self.out_dir / f"{args.name}_args.txt").write_text(str(args.to_dict()))

        # NOTE: this gate mirrors the reference's use_mask at eval
        # (train.py:703: mask_c or clabels or gapt_mask) — it decides label
        # conditioning AND whether gen_jet_corrections strips a mask channel,
        # independently of args.mask. Reference parity, quirk included.
        self.use_labels = bool(args.get("mask_c") or args.clabels or args.get("gapt_mask"))

        # stable eval post-generation hook: the compiled eval sampler is
        # cached by post_fn identity (sampling._cached_scan_all), so this
        # must NOT be rebuilt per eval call
        if self.suite.decode_eval is not None:
            self._eval_post_fn = self.suite.decode_eval
        elif self.suite.post_gen is not None:
            post_gen = self.suite.post_gen
            self._eval_post_fn = lambda out, point_noise: post_gen(out)
        else:
            self._eval_post_fn = None

        g_opt = build_optimizer(
            args.optimizer, args.lr_gen, beta1=args.beta1, beta2=args.beta2
        )
        d_opt = build_optimizer(
            args.optimizer, args.lr_disc, beta1=args.beta1, beta2=args.beta2
        )
        self.g_opt, self.d_opt = g_opt, d_opt

        step_cfg = StepConfig(
            loss=args.loss,
            gp_lambda=args.gp,
            label_smoothing=args.label_smoothing,
            label_noise=args.label_noise,
            augment=AugmentConfig(
                aug_t=args.aug_t, aug_f=args.aug_f, aug_r90=args.aug_r90, aug_s=args.aug_s,
                translate_ratio=args.translate_ratio, scale_sd=args.scale_sd,
            ),
            aug_prob=args.aug_prob,
            # --compute-dtype bfloat16: opt-in mixed-precision training
            # (f32 master weights, bf16 applies — see StepConfig.bf16)
            bf16=args.get("compute_dtype", "float32") == "bfloat16",
            # one 2B-row D pass over [real | fake] (StepConfig.batched_d):
            # built as the round-5 attack on GAPT's launch-bound train step,
            # MEASURED-REJECTED on hardware — 4.707 ms two-pass vs 5.008 ms
            # batched at the B=512 bench config (scripts/
            # gapt_train_ablation.py; the 2B-row attention pass costs more
            # than the saved dispatches). Stays opt-in via StepConfig for
            # the ablation + tests; production keeps two passes, like the
            # reference (train.py:425-447).
            batched_d=False,
        )
        if mesh is None and args.get("mesh_shape"):
            mesh = make_mesh(int(args.mesh_shape))  # CLI passes a string
        self._step_cfg = step_cfg
        self._mesh = mesh
        self._staged = None  # (device data, device labels)
        self._staged_loader = None  # loader the staging came from
        # delayed masking (old_model.py:268-269): legacy Graph_GAN configs
        # compare a model-epoch against ``mask_epoch`` before enabling masks.
        # The comparison gates *structure* (whether a mask array is threaded
        # through the MP layers), so the epoch must be trace-static — the
        # steps are rebuilt (one retrace) exactly when a threshold is
        # crossed. NOTE the reference's own training never exercises this:
        # train.py's train_D/train_G accept ``epoch`` (train.py:412,490,
        # passed at 855,876) but never forward it into ``D(...)``/``gen()``,
        # so reference forwards always run with the epoch=0 default and
        # ``--mask-epoch > 0`` silently keeps masking off forever. This
        # implements old_model.py's documented semantics instead.
        self._mask_thresholds = sorted(
            {
                int(getattr(cfg, "mask_epoch", 0))
                for cfg in (self.suite.g_cfg, self.suite.d_cfg)
                if int(getattr(cfg, "mask_epoch", 0)) > 0
            }
        )
        self._steps_phase: int | None = None
        self._build_steps(self._epoch_phase(self.start_epoch))

        # resume (setup_training.py:1138-1152)
        self.state = init_train_state(
            jax.random.PRNGKey(args.seed),
            self.suite.g_init, self.suite.d_init,
            self.suite.g_cfg, self.suite.d_cfg,
            g_opt, d_opt,
        )
        if self.start_epoch > 0:
            self.state = ckpt.load_train_state(
                ckpt.checkpoint_path(self.models_dir, self.start_epoch), self.state
            )
            logger.info(f"resumed from epoch {self.start_epoch}")

        self.d_loss_keys = ["Dr", "Df", "D"] + (["gp"] if args.gp else [])
        self.eval_keys = ["w1p", "w1m"]
        if args.get("efp"):
            self.eval_keys.append("w1efp")
        if args.get("fpnd") and self.fpnd_fn is not None:
            self.eval_keys.append("fpnd")
        if args.get("fpd"):
            self.eval_keys.append("fpd")
        if args.get("cov_mmd"):
            # staged in the reference (flags at setup_training.py:320-331,
            # calls commented out at train.py:604-606) — live here
            self.eval_keys.append("cov_mmd")
        self.multi_value_keys = ["w1p", "w1m", "w1efp", "fpd", "cov_mmd"]
        if self.start_epoch:
            self.losses = ckpt.load_losses(
                self.losses_dir, self.d_loss_keys + ["G"] + self.eval_keys,
                self.eval_keys, self.multi_value_keys,
                self.start_epoch, args.save_epochs,
            )
        else:
            self.losses = {k: [] for k in self.d_loss_keys + ["G"] + self.eval_keys}
        # best-epoch state survives a resume (setup_training.py:1588-1596) —
        # otherwise the first post-resume eval would overwrite
        # state_best_epoch.npz with a possibly worse model. The [0, 10.0]
        # sentinel matches the reference's initial FPD bar exactly.
        self.best_epoch = [[0, 10.0]]
        if self.start_epoch > 0:
            best_file = self.out_dir / "best_epoch.txt"
            if best_file.exists():
                arr = np.loadtxt(best_file)
                if arr.ndim == 1:
                    arr = arr[None]
                self.best_epoch = arr.tolist()
            else:
                logger.info("best epoch file not found")

    # -- step construction ---------------------------------------------------

    def _epoch_phase(self, model_epoch: int) -> int:
        """Representative static epoch for trace purposes: the largest
        ``mask_epoch`` threshold already crossed (0 before any). Two configs
        with different thresholds flip independently because
        ``phase >= t  <=>  model_epoch >= t`` for every threshold ``t``."""
        return max([0] + [t for t in self._mask_thresholds if t <= model_epoch])

    def _wrap_epoch_aware(self, apply_fn, cfg, model_epoch: int):
        if int(getattr(cfg, "mask_epoch", 0)) <= 0:
            return apply_fn

        def wrapped(cfg_, params, state, x, labels, **kw):
            return apply_fn(cfg_, params, state, x, labels, epoch=model_epoch, **kw)

        return wrapped

    def _build_steps(self, epoch_phase: int) -> None:
        """(Re)build + (re)jit the train-step functions for a given static
        masking phase. Called once at construction and again whenever
        training crosses a ``mask_epoch`` threshold (legacy delayed masking,
        old_model.py:268-269) — each crossing costs one retrace."""
        args = self.args
        mesh = self._mesh
        if self._steps_phase == epoch_phase:
            return
        self._steps_phase = epoch_phase
        # eval generation uses the same phase so a model past its mask_epoch
        # also masks at eval time (a fresh wrapper per crossing keys a fresh
        # compiled sampler in sampling's fn-identity cache)
        self._g_apply_eval = self._wrap_epoch_aware(
            self.suite.g_apply, self.suite.g_cfg, epoch_phase
        )
        d_step, g_step = make_train_steps(
            step_cfg=self._step_cfg,
            g_apply=self._g_apply_eval,
            d_apply=self._wrap_epoch_aware(self.suite.d_apply, self.suite.d_cfg, epoch_phase),
            g_cfg=self.suite.g_cfg,
            d_cfg=self.suite.d_cfg,
            spec=self.suite.noise,
            g_opt=self.g_opt,
            d_opt=self.d_opt,
            use_labels=self.use_labels,
            encode_real=self.suite.encode_real,
            post_gen=self.suite.post_gen,
            pmean_axis="data" if mesh is not None else None,
        )

        def dg_step(state, *batch):
            state, dm = d_step(state, *batch)
            state, gm = g_step(state, *batch)
            return state, {**dm, **gm}

        n_batch_args = 2 if self.use_labels else 1
        self.dg_step = None
        # device-side epoch loop (single-chip num_critic=num_gen=1 regime):
        # lax.scan over per-epoch batch permutations with the dataset staged
        # on device once — ONE dispatch + ONE host sync per epoch. Each
        # per-batch dispatch over the remote tunnel costs ~4 ms H2D + a
        # multi-output execute ack; at 54 steps/epoch that tripled epoch
        # wall time (2.3 s -> 0.9 s measured at 30p B=256).
        self._dg_step_fn = dg_step if (args.num_critic == 1 and args.num_gen == 1) else None
        self._d_step_fn, self._g_step_fn = d_step, g_step  # raw (unjitted)
        self._epoch_scan = None  # captures the step fns — rebuild with them
        if mesh is not None:
            # per-shard execution via shard_map: the fused Pallas kernels run
            # locally on every chip, gradients pmean over ICI
            self.d_step = shard_map_step(
                d_step, mesh, num_batch_args=n_batch_args, donate_state=False
            )
            self.g_step = shard_map_step(
                g_step, mesh, num_batch_args=n_batch_args, donate_state=False
            )
            if args.num_critic == 1 and args.num_gen == 1:
                self.dg_step = shard_map_step(
                    dg_step, mesh, num_batch_args=n_batch_args, donate_state=False
                )
        else:
            self.d_step = jax.jit(d_step)
            self.g_step = jax.jit(g_step)
            if args.num_critic == 1 and args.num_gen == 1:
                # one dispatch per batch (D+G fused) — halves per-step launch
                # overhead (train.py runs both every batch in this regime)
                self.dg_step = jax.jit(dg_step)

    # -- one epoch (train.py:812-886) ---------------------------------------

    def _build_epoch_scan(self):
        keys = self.d_loss_keys + ["G"]
        d_keys = self.d_loss_keys
        use_labels = self.use_labels

        def batch_args(data_all, labels_all, idx):
            batch = jax.numpy.take(data_all, idx, axis=0)
            if use_labels:
                return (batch, jax.numpy.take(labels_all, idx, axis=0))
            return (batch,)

        if self._dg_step_fn is not None:
            dg = self._dg_step_fn

            def epoch_body(state, data_all, labels_all, perm, d_do, g_do):
                def body(st, idx):
                    st, m = dg(st, *batch_args(data_all, labels_all, idx))
                    return st, jax.numpy.stack([m[k] for k in keys])
                st, ms = jax.lax.scan(body, state, perm)
                return st, jax.numpy.sum(ms, axis=0)

            return self._wrap_epoch_body(epoch_body)

        # num_critic / num_gen interleave (train.py:841-878): per-batch
        # booleans decide which step runs; lax.cond executes one branch on
        # device, and a skipped step leaves the state (incl. rng) untouched,
        # exactly like the host-loop fallback
        d_fn, g_fn = self._d_step_fn, self._g_step_fn

        def epoch_body(state, data_all, labels_all, perm, d_do, g_do):
            def body(st, x):
                idx, dd, gd = x
                step_args = batch_args(data_all, labels_all, idx)

                def run_d(st):
                    st2, m = d_fn(st, *step_args)
                    return st2, jax.numpy.stack([m[k] for k in d_keys])

                st, dvec = jax.lax.cond(
                    dd, run_d,
                    lambda st: (st, jax.numpy.zeros(len(d_keys))), st,
                )

                def run_g(st):
                    st2, m = g_fn(st, *step_args)
                    return st2, m["G"]

                st, gval = jax.lax.cond(
                    gd, run_g, lambda st: (st, jax.numpy.zeros(())), st
                )
                return st, jax.numpy.concatenate([dvec, gval[None]])

            st, ms = jax.lax.scan(body, state, (perm, d_do, g_do))
            return st, jax.numpy.sum(ms, axis=0)

        return self._wrap_epoch_body(epoch_body)

    def _wrap_epoch_body(self, epoch_body):
        """jit the epoch scan — under ``shard_map`` over the data mesh when one
        is set, so multi-chip training keeps the one-dispatch-per-epoch loop.

        Sharding layout: train state and the staged dataset are REPLICATED
        (P()); the per-epoch ``[num_batches, B]`` batch-index array is sharded
        on its batch axis (P(None, "data")), so each chip gathers its own
        contiguous ``B/n_dev`` rows of every global batch from its replica of
        the dataset — exactly the rows ``NamedSharding(P("data"))`` would hand
        it in the per-batch mesh loop, hence loss-exact equivalence with that
        path. The inner steps were built with ``pmean_axis="data"`` so grads/
        metrics all-reduce over ICI inside the scan. Replicating the staged
        dataset costs HBM (JetNet150 full set is ~120 MB/chip) but keeps every
        index gather local — sharding the dataset instead would turn each
        batch gather into an all-to-all."""
        from jax.sharding import PartitionSpec as P

        if self._mesh is None:
            return jax.jit(epoch_body)
        return jax.jit(
            jax.shard_map(
                epoch_body,
                mesh=self._mesh,
                in_specs=(P(), P(), P(), P(None, "data"), P(), P()),
                out_specs=(P(), P()),
                check_vma=False,
            )
        )

    def _can_scan_epoch(self, loader: BatchLoader) -> bool:
        args = self.args
        if self._mesh is not None and loader.batch_size % self._mesh.size != 0:
            return False  # shard_map needs the batch axis divisible by the mesh
        return (
            args.get("epoch_scan", True)
            and loader.drop_remainder  # ragged final batch can't ride the scan
            and not args.get("break_zero")
            and not args.get("bottleneck")
        )

    def _scan_epoch(self, loader: BatchLoader) -> dict[str, float]:
        """One jitted scan over the whole epoch: dataset staged on device
        once, per-epoch shuffle shipped as a [num_batches, B] index array."""
        args = self.args
        num_batches = len(loader)
        if self._epoch_scan is None:
            self._epoch_scan = self._build_epoch_scan()
        if self._staged is None or self._staged_loader is not loader:
            # re-stage when a different loader is passed (train_epoch is a
            # public API): gathering a new loader's indices from the first
            # loader's staged arrays would silently train on stale data
            if self._mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                rep = NamedSharding(self._mesh, P())
                put = lambda a: jax.device_put(a, rep)  # noqa: E731
            else:
                put = jax.device_put
            data = put(loader.arrays[0])
            labels = (
                put(loader.arrays[1])
                if self.use_labels and len(loader.arrays) > 1
                else None
            )
            self._staged = (data, labels)
            self._staged_loader = loader
        data, labels = self._staged
        perm = jax.numpy.asarray(loader.epoch_batch_indices())
        ndx = np.arange(num_batches)
        d_do = (args.num_critic > 1) | (ndx == 0) | ((ndx - 1) % args.num_gen == 0)
        g_do = (args.num_critic == 1) | ((ndx - 1) % args.num_critic == 0)
        t0 = time.time()
        self.state, sums = self._epoch_scan(
            self.state, data, labels, perm,
            jax.numpy.asarray(d_do), jax.numpy.asarray(g_do),
        )
        t1 = time.time()
        out = np.asarray(sums)  # one sync
        logger.debug(f"epoch scan: dispatch {t1 - t0:.3f}s sync {time.time() - t1:.3f}s")
        keys = self.d_loss_keys + ["G"]
        return {k: float(v) for k, v in zip(keys, out)}

    def train_epoch(self, epoch: int, loader: BatchLoader) -> dict[str, float]:
        args = self.args
        # the reference's model-epoch is 0-based (train.py:855,876 pass
        # ``epoch - 1``); rebuild the steps iff a mask_epoch threshold is
        # crossed (no-op for every non-legacy config)
        self._build_steps(self._epoch_phase(epoch - 1))
        if len(loader) == 0:
            raise ValueError(
                f"training dataset ({loader.n} samples) is smaller than the "
                f"batch size ({loader.batch_size}): no full batch to train on"
            )
        if self._can_scan_epoch(loader):
            epoch_loss = self._scan_epoch(loader)
            num_batches = len(loader)
            bad = [k for k, v in epoch_loss.items() if not np.isfinite(v)]
            if bad:
                logger.warning(f"non-finite epoch losses at epoch {epoch}: {bad}")
            if args.get("debug"):
                data, labels = self._staged
                step_args = (data[: args.batch_size],)
                if self.use_labels:
                    step_args = (data[: args.batch_size], labels[: args.batch_size])
                self._log_d_outputs(step_args)
            for key in self.d_loss_keys:
                self.losses[key].append(epoch_loss[key] / (num_batches / args.num_gen))
            self.losses["G"].append(epoch_loss["G"] / (num_batches / args.num_critic))
            return epoch_loss
        # accumulate metrics as device scalars: no host sync inside the
        # epoch, so step dispatches pipeline (critical over high-latency
        # links and for keeping the device queue full)
        epoch_loss = {k: jax.numpy.zeros(()) for k in self.d_loss_keys + ["G"]}
        num_batches = len(loader)
        for batch_ndx, batch in enumerate(loader):
            data = jax.numpy.asarray(batch[0])
            step_args = (data,)
            if self.use_labels:
                step_args = (data, jax.numpy.asarray(batch[1]))

            if self.dg_step is not None:
                self.state, metrics = self.dg_step(self.state, *step_args)
                for key in self.d_loss_keys + ["G"]:
                    epoch_loss[key] = epoch_loss[key] + metrics[key]
                if args.get("break_zero") and batch_ndx == 0:
                    break
                if args.get("bottleneck") and batch_ndx == 10:
                    break
                continue

            if args.num_critic > 1 or (batch_ndx == 0 or (batch_ndx - 1) % args.num_gen == 0):
                self.state, d_metrics = self.d_step(self.state, *step_args)
                for key in self.d_loss_keys:
                    epoch_loss[key] = epoch_loss[key] + d_metrics[key]
            if args.num_critic == 1 or (batch_ndx - 1) % args.num_critic == 0:
                self.state, g_metrics = self.g_step(self.state, *step_args)
                epoch_loss["G"] = epoch_loss["G"] + g_metrics["G"]

            if args.get("break_zero") and batch_ndx == 0:
                break
            if args.get("bottleneck") and batch_ndx == 10:
                break

        epoch_loss = {k: float(v) for k, v in epoch_loss.items()}  # one sync
        # epoch-level NaN watchdog (old_model.py:363-416 logs NaNs at every
        # intermediate; here the first host sync is the cheap checkpoint —
        # use --debug-nans for the per-op version)
        bad = [k for k, v in epoch_loss.items() if not np.isfinite(v)]
        if bad:
            logger.warning(f"non-finite epoch losses at epoch {epoch}: {bad}")
        # last-batch D-output debug (train.py:426,444,447 logs D real/fake
        # outputs + G samples on the last batch of every epoch). The reference
        # prints at INFO unconditionally; here it runs only under --debug so
        # the normal epoch loop stays one-sync (and a DEBUG log level alone
        # does not add per-epoch dispatches).
        if args.get("debug"):
            self._log_d_outputs(step_args)
        for key in self.d_loss_keys:
            self.losses[key].append(epoch_loss[key] / (num_batches / args.num_gen))
        self.losses["G"].append(epoch_loss["G"] / (num_batches / args.num_critic))
        return epoch_loss

    def _log_d_outputs(self, step_args: tuple) -> None:
        """Log D(real), G samples, and D(fake) for one batch
        (train.py:413-447, `print_output` on the last batch)."""
        data = step_args[0]
        labels = step_args[1] if len(step_args) > 1 else None
        suite = self.suite
        key = jax.random.PRNGKey(0)
        if suite.encode_real is not None:
            data = suite.encode_real(data)
        real_out, _ = suite.d_apply(
            suite.d_cfg, self.state.d_params, self.state.d_state, data, labels, train=False
        )
        noise, _ = suite.noise.sample(key, data.shape[0], data.dtype)
        fake, _ = suite.g_apply(
            suite.g_cfg, self.state.g_params, self.state.g_state, noise, labels, train=False
        )
        if suite.post_gen is not None:
            fake = suite.post_gen(fake)
        fake_out, _ = suite.d_apply(
            suite.d_cfg, self.state.d_params, self.state.d_state, fake, labels, train=False
        )
        logger.info(f"D real output: \n {np.asarray(real_out[:10])}")
        logger.info(f"G output: \n {np.asarray(fake[:2, :10])}")
        logger.info(f"D fake output: \n {np.asarray(fake_out[:10])}")

    # -- evaluation + checkpoint + plots (train.py:686-809) ------------------

    def eval_save_plot(self, epoch: int) -> None:
        args = self.args
        ckpt.save_train_state(ckpt.checkpoint_path(self.models_dir, epoch), self.state)

        ds = self.valid_dataset
        n_eval = min(args.eval_tot_samples, len(ds))
        if args.get("eval_shuffle"):
            # real JetNet files are ordered; sample uniformly instead of the
            # reference's first-n protocol (train.py:699) when asked
            sel = np.sort(np.random.default_rng(args.seed).permutation(len(ds))[:n_eval])
        else:
            sel = slice(None, n_eval)
        real_norm = ds.particle_data[sel]
        real_jets, real_mask = _corrected(
            ds.particle_normalisation(real_norm, inverse=True),
            self.use_labels, zero_mask_particles=False, zero_neg_pt=False,
        )

        labels = ds.jet_data[sel] if self.use_labels else None
        post_fn = self._eval_post_fn
        gen_norm = generate_multi_batch(
            self._g_apply_eval, self.suite.g_cfg,
            self.state.g_params, self.state.g_state,
            self.suite.noise, jax.random.PRNGKey(epoch), n_eval, args.batch_size,
            labels=labels, post_fn=post_fn, mesh=self._mesh,
        )
        gen_jets, gen_mask = _corrected(
            ds.particle_normalisation(gen_norm, inverse=True),
            self.use_labels, zero_mask_particles=self.use_labels, zero_neg_pt=False,
        )

        num_w1 = args.w1_num_samples[0] if isinstance(args.w1_num_samples, list) else args.w1_num_samples
        num_batches = max(len(real_jets) // num_w1, 1)
        w1pm, w1ps = w1p(real_jets, gen_jets, num_eval_samples=num_w1, num_batches=num_batches)
        self.losses["w1p"].append(np.concatenate([w1pm, w1ps]).tolist())
        w1mm, w1ms = w1m(real_jets, gen_jets, num_eval_samples=num_w1, num_batches=num_batches)
        self.losses["w1m"].append([w1mm, w1ms])

        real_efps = gen_efps = None
        if "w1efp" in self.eval_keys:
            w1em, w1es = w1efp(real_jets, gen_jets, num_eval_samples=num_w1, num_batches=num_batches)
            self.losses["w1efp"].append(np.concatenate([w1em, w1es]).tolist())
        if "fpnd" in self.eval_keys:
            self.losses["fpnd"].append(float(self.fpnd_fn(gen_jets, args.jets, real_jets)))
        if "cov_mmd" in self.eval_keys:
            cov, mmd = cov_mmd(
                real_jets, gen_jets,
                num_eval_samples=min(args.cov_mmd_num_samples, n_eval),
                num_batches=args.cov_mmd_num_batches,
            )
            self.losses["cov_mmd"].append([cov, mmd])
        if "fpd" in self.eval_keys:
            real_efps = self._cached_real_efps(real_jets)
            gen_efps = efps(gen_jets, select="d<=4-all")
            bad = ~np.isfinite(gen_efps).all(axis=1)
            if bad.any():
                # unphysical early-training jets (negative pT -> unbounded
                # z-weights) overflow the f32 TPU path to inf; the reference
                # protocol's f64 arithmetic keeps them huge-but-finite, so
                # recompute those jets that way to stay comparable
                # (train.py:744-757) — only the affected rows, the f64 CPU
                # path costs minutes at full eval size
                gen_efps[bad] = efps(gen_jets[bad], select="d<=4-all", use_jax=False)
            fpd_val, fpd_std = fpd(
                real_jets, gen_jets, real_efps=real_efps, gen_efps=gen_efps,
                min_samples=min(5000, n_eval // 2), max_samples=min(20000, n_eval),
            )
            self.losses["fpd"].append([fpd_val, fpd_std])

        ckpt.save_losses(self.losses, self.losses_dir)
        try:
            plotting.plot_part_feats_jet_mass(
                args.jets, real_jets, gen_jets, real_mask, gen_mask,
                f"{epoch}pm", str(self.figs_dir),
                num_particles=args.num_hits, losses=self.losses,
            )
            if len(self.losses["G"]) > 1:
                plotting.plot_losses(self.losses, args.loss, str(epoch), str(self.losses_dir))
            if len(self.losses["w1m"]) > 1:
                plotting.plot_eval(
                    self.losses, epoch, args.save_epochs, f"{epoch}_eval", str(self.losses_dir)
                )
            if real_efps is not None:
                plotting.plot_efps(args.jets, real_efps, gen_efps, f"{epoch}efp", str(self.figs_dir))
        except Exception:  # plotting must never kill training
            logger.exception("plotting failed")

        # best-epoch tracking on FPD (train.py:794-809)
        if "fpd" in self.eval_keys and epoch > 0:
            score = self.losses["fpd"][-1][0] + self.losses["fpd"][-1][1]
            if score < self.best_epoch[-1][1]:
                self.best_epoch.append([epoch, score])
                np.savetxt(self.out_dir / "best_epoch.txt", np.asarray(self.best_epoch))
                np.save(self.out_dir / "best_epoch_gen_jets.npy", gen_jets)
                # mask + per-metric snapshot alongside (train.py:801-804)
                if gen_mask is not None:
                    np.save(self.out_dir / "best_epoch_gen_mask.npy", gen_mask)
                (self.out_dir / "best_epoch_losses.txt").write_text(
                    str({key: self.losses[key][-1] for key in self.losses if self.losses[key]})
                )
                ckpt.save_train_state(self.out_dir / "state_best_epoch.npz", self.state)

    def _cached_real_efps(self, real_jets: np.ndarray) -> np.ndarray:
        """EFP cache for the real side (train.py:744-757). The cache key
        carries the eval-sampling mode: a shuffled eval selects a different
        real subset of the same length, so reusing the first-n cache would
        standardize FPD against jets that are not being evaluated."""
        mode = f"_shuf{self.args.seed}" if self.args.get("eval_shuffle") else ""
        # "d4all" key: the FPD basis moved from 20 primes to the full 35-col
        # d<=4 set (primes+composites) — a stale prime-only cache must not be
        # standardizing the new features
        cache = self.out_dir / f"real_efps_d4all_{self.args.jets}{mode}.npy"
        if cache.exists():
            arr = np.load(cache)
            if len(arr) == len(real_jets):
                return arr
        arr = efps(real_jets, select="d<=4-all")
        np.save(cache, arr)
        return arr

    # -- full run (train.py:889-985) ----------------------------------------

    def train(self) -> None:
        args = self.args
        if self.start_epoch == 0 and args.get("save_zero"):
            self.eval_save_plot(0)

        loader = BatchLoader(
            self.train_dataset.particle_data,
            self.train_dataset.jet_data if self.use_labels else None,
            batch_size=args.batch_size, shuffle=True, seed=args.seed,
        )
        for i in range(self.start_epoch, args.num_epochs):
            epoch = i + 1
            t0 = time.time()
            if args.get("profile") and i == self.start_epoch:
                # device+host trace of the first epoch (replaces the
                # reference's --bottleneck truncation mode, SURVEY.md §5)
                with jax.profiler.trace(str(self.out_dir / "profile")):
                    self.train_epoch(epoch, loader)
            else:
                self.train_epoch(epoch, loader)
            logger.info(
                f"epoch {epoch}: "
                + " ".join(f"{k}={self.losses[k][-1]:.4f}" for k in self.d_loss_keys + ["G"])
                + f" ({time.time() - t0:.1f}s)"
            )
            if epoch % args.save_epochs == 0:
                self.eval_save_plot(epoch)
            elif epoch % args.save_model_epochs == 0:
                ckpt.save_train_state(ckpt.checkpoint_path(self.models_dir, epoch), self.state)
                # keep loss histories aligned with whichever snapshot
                # latest_epoch() discovers on resume: without this, resuming
                # from a model-only checkpoint (save_model_epochs <
                # save_epochs) would replay from an epoch whose train losses
                # were never persisted, shifting every later index. The
                # reference writes losses every epoch (train.py:538-540).
                ckpt.save_losses(self.losses, self.losses_dir)


def _corrected(unnorm: np.ndarray, use_mask: bool, **kwargs):
    if use_mask:
        jets, mask = gen_jet_corrections(unnorm, ret_mask_separate=True, **kwargs)
        return jets, mask
    return gen_jet_corrections(unnorm, ret_mask_separate=False, **kwargs), None
