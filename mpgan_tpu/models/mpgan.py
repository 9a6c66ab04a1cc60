"""MPGAN generator and discriminator.

Functional re-implementation of the reference ``MPNet`` /
``MPGenerator`` / ``MPDiscriminator`` (mpgan/model.py:387-894): a stack of
``mp_iters`` message-passing layers between model-specific pre/post hooks.

Masking strategies supported (mpgan/model.py:608-752, SURVEY.md C8):

- ``mask_c``: conditional on the real per-jet particle multiplicity —
  particles are ranked by their first noise feature and the first
  ``count`` particles get mask 1 (the flagship strategy),
- ``mask_learn``: per-particle mask predicted from the particle's noise by the
  ``fmg`` MLP (sign for binary, sigmoid for continuous),
- ``mask_learn_sep``: a jet-level noise "particle" is split off and fed to
  ``fmg`` to predict a multiplicity distribution; argmax gives the count,
- ``mask_feat_bin``: the generator's last output feature becomes a binary mask.

Note: the reference's ``MPGenerator._init_mask`` references an undefined
``self.first_layer_node_size`` (mpgan/model.py:626), so ``mask_learn`` /
``mask_learn_sep`` crash there (they only work in the legacy
``old_model.py``). Here ``fmg`` takes the generator's input node size, which
is what the legacy model used (old_model.py:31-37), making these strategies
functional again.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.linear import MLPConfig, mlp_apply, mlp_init, linear_init
from ..ops.masking import counts_from_labels, mask_from_counts, split_mask
from ..ops.mp import MPLayerConfig, mp_layer_apply, mp_layer_init


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    mask_learn: bool = False
    mask_learn_bin: bool = True
    mask_learn_sep: bool = False
    mask_c: bool = True
    mask_fne_np: bool = False
    mask_feat_bin: bool = False
    mask_fnd_np: bool = False
    fmg: tuple[int, ...] = (64,)

    @property
    def use_mask_gen(self) -> bool:
        return self.mask_learn or self.mask_c or self.mask_learn_sep


def _build_layers(
    num_particles: int,
    input_node_size: int,
    mp_iters: int,
    fe_layers: list[int],
    fn_layers: list[int],
    fe1_layers: list[int] | None,
    fn1_layers: list[int] | None,
    hidden_node_size: int,
    output_node_size: int,
    mp_args: dict[str, Any],
    mp_args_first_layer: dict[str, Any],
    linear_args: dict[str, Any],
) -> tuple[MPLayerConfig, ...]:
    """Layer-stack assembly mirroring MPNet.__init__ (mpgan/model.py:460-496)."""
    fe1_layers = fe_layers if fe1_layers is None else fe1_layers
    fn1_layers = fn_layers if fn1_layers is None else fn1_layers
    first_args = {**mp_args, **mp_args_first_layer}
    layers = [
        MPLayerConfig.build(
            input_node_size, list(fe1_layers), list(fn1_layers), hidden_node_size,
            linear_args=linear_args, **first_args,
        )
    ]
    for _ in range(mp_iters - 2):
        layers.append(
            MPLayerConfig.build(
                hidden_node_size, list(fe_layers), list(fn_layers), hidden_node_size,
                linear_args=linear_args, **mp_args,
            )
        )
    layers.append(
        MPLayerConfig.build(
            hidden_node_size, list(fe_layers), list(fn_layers), output_node_size,
            linear_args=linear_args, **mp_args,
        )
    )
    return tuple(layers)


@dataclasses.dataclass(frozen=True)
class MPGeneratorConfig:
    num_particles: int
    input_node_size: int
    output_node_size: int
    layers: tuple[MPLayerConfig, ...]
    mask: MaskConfig
    final_activation: str = "tanh"
    lfc: bool = False
    lfc_latent_size: int = 128
    fmg_cfg: MLPConfig | None = None
    # None = auto: fused Pallas kernel on TPU, jnp path elsewhere
    use_pallas: bool | None = None

    @staticmethod
    def build(
        num_particles: int,
        input_node_size: int,
        output_node_size: int = 3,
        mp_iters: int = 2,
        fe_layers: list[int] = (96, 160, 192),
        fn_layers: list[int] = (256, 256),
        fe1_layers: list[int] | None = None,
        fn1_layers: list[int] | None = None,
        hidden_node_size: int = 32,
        final_activation: str = "tanh",
        lfc: bool = False,
        lfc_latent_size: int = 128,
        mask: MaskConfig = MaskConfig(),
        mp_args: dict[str, Any] | None = None,
        mp_args_first_layer: dict[str, Any] | None = None,
        linear_args: dict[str, Any] | None = None,
        use_pallas: bool | None = None,
    ) -> "MPGeneratorConfig":
        layers = _build_layers(
            num_particles, input_node_size, mp_iters, list(fe_layers), list(fn_layers),
            fe1_layers, fn1_layers, hidden_node_size, output_node_size,
            mp_args or {}, mp_args_first_layer or {}, linear_args or {},
        )
        fmg_cfg = None
        if mask.mask_learn or mask.mask_learn_sep:
            fmg_cfg = MLPConfig.build(
                list(mask.fmg),
                input_size=input_node_size,
                output_size=1 if mask.mask_learn else num_particles,
                final_linear=True,
                **(linear_args or {}),
            )
        return MPGeneratorConfig(
            num_particles=num_particles,
            input_node_size=input_node_size,
            output_node_size=output_node_size,
            layers=layers,
            mask=mask,
            final_activation=final_activation,
            lfc=lfc,
            lfc_latent_size=lfc_latent_size,
            fmg_cfg=fmg_cfg,
            use_pallas=use_pallas,
        )


def mp_generator_init(rng: jax.Array, cfg: MPGeneratorConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, len(cfg.layers) + 2)
    params: dict = {"mp_layers": []}
    state: dict = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        p, s = mp_layer_init(keys[i], layer_cfg, dtype)
        params["mp_layers"].append(p)
        state["mp_layers"].append(s)
    if cfg.lfc:
        params["lfc"] = linear_init(
            keys[-2], cfg.lfc_latent_size, cfg.num_particles * cfg.input_node_size, dtype
        )
    if cfg.fmg_cfg is not None:
        params["fmg"], state["fmg"] = mlp_init(keys[-1], cfg.fmg_cfg, dtype)
    return params, state


def _gen_get_mask(cfg: MPGeneratorConfig, params, state, x, labels, train, rng):
    """Masking hook (mpgan/model.py:632-721). Returns (x, mask, njp, fmg_state)."""
    m = cfg.mask
    fmg_state = state.get("fmg")
    if not m.use_mask_gen:
        return x, None, None, fmg_state

    num_jet_particles = None
    if m.mask_learn:
        raw, fmg_state = mlp_apply(cfg.fmg_cfg, params["fmg"], state["fmg"], x, train=train, rng=rng)
        mask = jnp.sign(raw) if m.mask_learn_bin else jax.nn.sigmoid(raw)
        if m.mask_fne_np:
            num_jet_particles = jnp.mean(mask, axis=1)
    elif m.mask_c:
        num_jet_particles = counts_from_labels(labels, cfg.num_particles)
        mask = mask_from_counts(x[:, :, 0], num_jet_particles)
    else:  # mask_learn_sep: last "particle" is the jet-level noise
        njp_input = x[:, -1, :]
        x = x[:, :-1, :]
        logits, fmg_state = mlp_apply(
            cfg.fmg_cfg, params["fmg"], state["fmg"], njp_input, train=train, rng=rng
        )
        num_jet_particles = jnp.argmax(logits, axis=1)
        mask = mask_from_counts(x[:, :, 0], num_jet_particles)
    return x, mask, num_jet_particles, fmg_state


def mp_generator_apply(
    cfg: MPGeneratorConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    labels: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
) -> tuple[jax.Array, dict]:
    """Generator forward (mpgan/model.py:498-523 with generator hooks).

    ``x``: ``[B, lfc_latent_size]`` if ``lfc`` else ``[B, N(+1 if
    mask_learn_sep), input_node_size]`` noise. Returns
    ``([B, N, output_node_size(+1 if masked)], new_state)``.
    """
    n_rngs = len(cfg.layers) + 1
    rngs = jax.random.split(rng, n_rngs) if rng is not None else [None] * n_rngs

    if cfg.lfc:
        w, b = params["lfc"]["w"], params["lfc"]["b"]
        x = (x @ w.T + b).reshape(x.shape[0], cfg.num_particles, cfg.input_node_size)

    x, mask, num_jet_particles, fmg_state = _gen_get_mask(
        cfg, params, state, x, labels, train, rngs[-1]
    )

    new_state: dict = {"mp_layers": []}
    if fmg_state is not None:
        new_state["fmg"] = fmg_state

    for i, layer_cfg in enumerate(cfg.layers):
        x, s = mp_layer_apply(
            layer_cfg, params["mp_layers"][i], state["mp_layers"][i], x,
            mask=mask, labels=labels, num_jet_particles=num_jet_particles,
            train=train, rng=rngs[i], update_sn=update_sn, use_pallas=cfg.use_pallas,
        )
        new_state["mp_layers"].append(s)

    if cfg.final_activation == "tanh":
        x = jnp.tanh(x)
    elif cfg.final_activation == "sigmoid":
        x = jax.nn.sigmoid(x)

    # final mask handling (mpgan/model.py:723-752)
    if cfg.mask.mask_feat_bin:
        mask = jnp.sign(x[:, :, -1:])
        x = x[:, :, :-1]
    if mask is not None:
        x = jnp.concatenate([x, mask - 0.5], axis=2)
    return x, new_state


@dataclasses.dataclass(frozen=True)
class MPDiscriminatorConfig:
    num_particles: int
    input_node_size: int
    layers: tuple[MPLayerConfig, ...]
    mask: MaskConfig
    final_activation: str = "sigmoid"
    dea: bool = True
    dea_sum: bool = True
    fnd_cfg: MLPConfig | None = None
    mask_manual: bool = False
    # None = auto: fused Pallas kernel on TPU, jnp path elsewhere
    use_pallas: bool | None = None

    @property
    def use_mask(self) -> bool:
        return (
            self.mask_manual
            or self.mask.mask_learn
            or self.mask.mask_c
            or self.mask.mask_learn_sep
        )

    @staticmethod
    def build(
        num_particles: int,
        input_node_size: int,
        mp_iters: int = 2,
        fe_layers: list[int] = (96, 160, 192),
        fn_layers: list[int] = (256, 256),
        fe1_layers: list[int] | None = None,
        fn1_layers: list[int] | None = None,
        hidden_node_size: int = 32,
        final_activation: str = "sigmoid",
        dea: bool = True,
        dea_sum: bool = True,
        fnd: list[int] = (),
        mask: MaskConfig = MaskConfig(),
        mask_manual: bool = False,
        mp_args: dict[str, Any] | None = None,
        mp_args_first_layer: dict[str, Any] | None = None,
        linear_args: dict[str, Any] | None = None,
        use_pallas: bool | None = None,
    ) -> "MPDiscriminatorConfig":
        output_node_size = 1 if not dea else hidden_node_size
        layers = _build_layers(
            num_particles, input_node_size, mp_iters, list(fe_layers), list(fn_layers),
            fe1_layers, fn1_layers, hidden_node_size, output_node_size,
            mp_args or {}, mp_args_first_layer or {}, linear_args or {},
        )
        fnd_cfg = None
        if dea:
            fnd_cfg = MLPConfig.build(
                list(fnd),
                input_size=hidden_node_size + int(mask.mask_fnd_np),
                output_size=1,
                final_linear=True,
                **(linear_args or {}),
            )
        return MPDiscriminatorConfig(
            num_particles=num_particles,
            input_node_size=input_node_size,
            layers=layers,
            mask=mask,
            final_activation=final_activation,
            dea=dea,
            dea_sum=dea_sum,
            fnd_cfg=fnd_cfg,
            mask_manual=mask_manual,
            use_pallas=use_pallas,
        )


def mp_discriminator_init(rng: jax.Array, cfg: MPDiscriminatorConfig, dtype=jnp.float32):
    keys = jax.random.split(rng, len(cfg.layers) + 1)
    params: dict = {"mp_layers": []}
    state: dict = {"mp_layers": []}
    for i, layer_cfg in enumerate(cfg.layers):
        p, s = mp_layer_init(keys[i], layer_cfg, dtype)
        params["mp_layers"].append(p)
        state["mp_layers"].append(s)
    if cfg.fnd_cfg is not None:
        params["fnd"], state["fnd"] = mlp_init(keys[-1], cfg.fnd_cfg, dtype)
    return params, state


def mp_discriminator_apply(
    cfg: MPDiscriminatorConfig,
    params: dict,
    state: dict,
    x: jax.Array,
    labels: jax.Array | None = None,
    *,
    train: bool = False,
    rng: jax.Array | None = None,
    update_sn: bool = True,
) -> tuple[jax.Array, dict]:
    """Discriminator forward: mask split (mpgan/model.py:833-890), message
    passing, masked pooling + ``fnd`` head (mpgan/model.py:810-831).

    ``x``: ``[B, N, input_node_size (+1 mask feature if masked)]``.
    Returns ``([B, 1], new_state)``.
    """
    n_rngs = len(cfg.layers) + 1
    rngs = jax.random.split(rng, n_rngs) if rng is not None else [None] * n_rngs

    mask = None
    num_jet_particles = None
    if cfg.use_mask or cfg.mask.mask_fnd_np:
        _, mask = split_mask(x)
    if cfg.use_mask:
        x = x[:, :, :-1]
    else:
        mask = None if not cfg.mask.mask_fnd_np else mask
    if cfg.mask.mask_fne_np:
        num_jet_particles = jnp.mean(mask, axis=1)

    new_state: dict = {"mp_layers": []}
    mp_mask = mask if cfg.use_mask else None
    for i, layer_cfg in enumerate(cfg.layers):
        x, s = mp_layer_apply(
            layer_cfg, params["mp_layers"][i], state["mp_layers"][i], x,
            mask=mp_mask, labels=labels, num_jet_particles=num_jet_particles,
            train=train, rng=rngs[i], update_sn=update_sn, use_pallas=cfg.use_pallas,
        )
        new_state["mp_layers"].append(s)

    # pooling (mpgan/model.py:810-822)
    do_mean = not (cfg.dea and cfg.dea_sum)
    if cfg.use_mask:
        x = x * mp_mask
        x = jnp.sum(x, axis=1)
        if do_mean:
            x = x / (jnp.sum(mp_mask, axis=1) + 1e-12)
    else:
        x = jnp.mean(x, axis=1) if do_mean else jnp.sum(x, axis=1)

    if cfg.dea:
        if cfg.mask.mask_fnd_np:
            x = jnp.concatenate([num_jet_particles, x], axis=1)
        x, fnd_state = mlp_apply(
            cfg.fnd_cfg, params["fnd"], state["fnd"], x,
            train=train, rng=rngs[-1], update_sn=update_sn,
        )
        new_state["fnd"] = fnd_state

    if cfg.final_activation == "sigmoid":
        x = jax.nn.sigmoid(x)
    elif cfg.final_activation == "tanh":
        x = jnp.tanh(x)
    return x, new_state
