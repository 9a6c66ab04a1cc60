"""TreeGAN generator (ext_models/ext_models.py:211-336, from
arXiv:1905.06292): grows a cloud from a single root node through per-depth
tree graph convolutions with branching factors ``degrees``.

Each ``TreeGCN`` depth combines (ext_models.py:254-282):

- a root term: the sum over all ancestor layers of a per-layer linear map,
  tiled up to the current node count,
- a branch term: per-node upsampling by ``degree`` via the learned
  ``W_branch`` tensor, followed by the two-layer (no-bias) ``W_loop`` MLP,
- a learned per-degree bias and LeakyReLU(0.2) (disabled at the last depth).

Node counts double each depth (1 -> 32 for degrees [2]*5), so the reference
pads jets to the next power of two (setup_training.py:996-1003).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TreeGANGConfig:
    features: tuple[int, ...] = (96, 64, 64, 64, 64, 3)
    degrees: tuple[int, ...] = (2, 2, 2, 2, 2)
    support: int = 10

    @property
    def layer_num(self) -> int:
        return len(self.features) - 1


def _linear_no_bias(rng, in_dim, out_dim, dtype):
    bound = 1.0 / math.sqrt(in_dim)
    return jax.random.uniform(rng, (out_dim, in_dim), dtype, -bound, bound)


def _xavier_gain(rng, shape, gain, dtype):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -bound, bound)


def treegan_g_init(rng: jax.Array, cfg: TreeGANGConfig, dtype=jnp.float32):
    params = {"layers": []}
    node = 1
    for depth in range(cfg.layer_num):
        keys = jax.random.split(jax.random.fold_in(rng, depth), depth + 5)
        in_f, out_f = cfg.features[depth], cfg.features[depth + 1]
        degree = cfg.degrees[depth]
        layer = {
            # one root map per ancestor layer (ext_models.py:224-229)
            "w_root": [
                _linear_no_bias(keys[i], cfg.features[i], out_f, dtype)
                for i in range(depth + 1)
            ],
            # upsampling tensor [node, in, degree*in] (ext_models.py:231-234)
            "w_branch": _xavier_gain(
                keys[-4], (node, in_f, degree * in_f), math.sqrt(2.0), dtype
            ),
            "w_loop1": _linear_no_bias(keys[-3], in_f, in_f * cfg.support, dtype),
            "w_loop2": _linear_no_bias(keys[-2], in_f * cfg.support, out_f, dtype),
            "bias": jax.random.uniform(
                keys[-1], (1, degree, out_f), dtype,
                -1.0 / math.sqrt(out_f), 1.0 / math.sqrt(out_f),
            ),
        }
        params["layers"].append(layer)
        node *= degree
    return params, {}


def treegan_g_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    """``x``: root noise ``[B, 1, features[0]]`` (the reference passes a
    one-element list, train.py:133). Returns the final cloud
    ``[B, prod(degrees), features[-1]]``."""
    if isinstance(x, (list, tuple)):
        x = x[0]
    tree = [x]
    node = 1
    batch = x.shape[0]
    for depth in range(cfg.layer_num):
        layer = params["layers"][depth]
        in_f, out_f = cfg.features[depth], cfg.features[depth + 1]
        degree = cfg.degrees[depth]

        # root: ancestor contributions tiled to the current node count
        root = 0
        for inx in range(depth + 1):
            root_num = tree[inx].shape[1]
            repeat = node // root_num
            mapped = tree[inx] @ layer["w_root"][inx].T  # [B, root_num, out_f]
            root = root + jnp.repeat(mapped, repeat, axis=1)

        # branch: per-node upsample + W_loop MLP (ext_models.py:265-272)
        branch = jnp.einsum("bnf,nfk->bnk", tree[-1], layer["w_branch"])
        branch = jax.nn.leaky_relu(branch, 0.2)
        branch = branch.reshape(batch, node * degree, in_f)
        branch = branch @ layer["w_loop1"].T
        branch = branch @ layer["w_loop2"].T
        branch = jnp.repeat(root, degree, axis=1) + branch

        if depth != cfg.layer_num - 1:
            bias = jnp.tile(layer["bias"], (1, node, 1))
            branch = jax.nn.leaky_relu(branch + bias, 0.2)
        tree.append(branch)
        node *= degree
    return tree[-1], state
