"""GraphCNN-GAN generator (ext_models/ext_models.py:75-157, from
arXiv:1901.05237): dense latent -> initial graph, then per-layer dynamic
k-nn graph rebuild + edge-conditioned convolution (PyG ``NNConv`` with mean
aggregation and root weight) + batch norm.

The per-layer knn graph is computed densely per jet (argsort over the
pairwise distance matrix — clouds are tiny) and NNConv becomes an einsum
over gathered neighbours: ``out[i] = W x_i + mean_j h(e_ij)·x_j + b`` with
``h`` a linear map producing an [in, out] matrix per edge and
``e_ij = x_j - x_i`` (ext_models.py:148-150).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ...ops.gather import one_hot_gather
from ...ops.linear import linear_init

_BN_EPS = 1e-5
_BN_MOMENTUM = 0.1


@dataclasses.dataclass(frozen=True)
class GraphCNNGANGConfig:
    latent_dim: int
    layers: tuple[int, ...]  # e.g. (32, 24)
    num_hits: int
    node_feat_size: int
    num_knn: int = 20
    final_tanh: bool = False
    leaky_relu_alpha: float = 0.2

    @property
    def all_sizes(self) -> tuple[int, ...]:
        return (*self.layers, self.node_feat_size)


def graphcnn_g_init(rng: jax.Array, cfg: GraphCNNGANGConfig, dtype=jnp.float32):
    sizes = cfg.all_sizes
    keys = jax.random.split(rng, 3 * len(sizes) + 1)
    params = {
        "dense": linear_init(keys[0], cfg.latent_dim, cfg.num_hits * sizes[0], dtype),
        "convs": [],
        "bn": [],
    }
    state = {"bn": []}
    for i in range(len(sizes) - 1):
        in_f, out_f = sizes[i], sizes[i + 1]
        params["convs"].append(
            {
                # edge network: Linear(in_f, in_f * out_f) (ext_models.py:88-93)
                "edge": linear_init(keys[3 * i + 1], in_f, in_f * out_f, dtype),
                "root": linear_init(keys[3 * i + 2], in_f, out_f, dtype),
            }
        )
        params["bn"].append(
            {"scale": jnp.ones((out_f,), dtype), "bias": jnp.zeros((out_f,), dtype)}
        )
        state["bn"].append(
            {"mean": jnp.zeros((out_f,), dtype), "var": jnp.ones((out_f,), dtype)}
        )
    return params, state


def _knn_gather(x: jax.Array, k: int, loop: bool):
    """Indices [B, N, k] of each node's k nearest neighbours (euclidean)."""
    d = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
    if not loop:
        n = x.shape[1]
        d = d + jnp.eye(n, dtype=x.dtype) * 1e10
    return jnp.argsort(d, axis=2)[:, :, :k]


def graphcnn_g_apply(cfg, params, state, x, labels=None, *, train=False, rng=None, update_sn=True):
    sizes = cfg.all_sizes
    b = x.shape[0]
    x = jax.nn.leaky_relu(
        x @ params["dense"]["w"].T + params["dense"]["b"], cfg.leaky_relu_alpha
    )
    x = x.reshape(b, cfg.num_hits, sizes[0])

    loop = cfg.num_knn == cfg.num_hits
    new_state = {"bn": []}
    for i, conv in enumerate(params["convs"]):
        in_f, out_f = sizes[i], sizes[i + 1]
        idx = _knn_gather(x, cfg.num_knn, loop)  # [B, N, k]
        # neighbour features via the one-hot matmul gather (bit-identical
        # to take_along_axis, ~11x faster on TPU, and no [B, N, N, F]
        # repeat materialization — ops/gather.py)
        xj = one_hot_gather(x, idx)  # [B, N, k, in_f]
        e = xj - x[:, :, None, :]  # edge attr = x_src - x_dst
        h = e @ conv["edge"]["w"].T + conv["edge"]["b"]  # [B, N, k, in_f*out_f]
        h = h.reshape(b, cfg.num_hits, cfg.num_knn, in_f, out_f)
        msg = jnp.einsum("bnkf,bnkfo->bno", xj, h) / cfg.num_knn
        x = x @ conv["root"]["w"].T + msg + conv["root"]["b"]

        # torch_geometric BatchNorm over all nodes (ext_models.py:104)
        bn_p, bn_s = params["bn"][i], state["bn"][i]
        if train:
            flat = x.reshape(-1, out_f)
            bmean = jnp.mean(flat, axis=0)
            bvar = jnp.var(flat, axis=0)
            nelem = flat.shape[0]
            unbiased = bvar * nelem / max(nelem - 1, 1)
            new_state["bn"].append(
                {
                    "mean": (1 - _BN_MOMENTUM) * bn_s["mean"] + _BN_MOMENTUM * bmean,
                    "var": (1 - _BN_MOMENTUM) * bn_s["var"] + _BN_MOMENTUM * unbiased,
                }
            )
            x = (x - bmean) * jax.lax.rsqrt(bvar + _BN_EPS) * bn_p["scale"] + bn_p["bias"]
        else:
            new_state["bn"].append(dict(bn_s))
            x = (x - bn_s["mean"]) * jax.lax.rsqrt(bn_s["var"] + _BN_EPS) * bn_p[
                "scale"
            ] + bn_p["bias"]

        if i < len(params["convs"]) - 1:
            x = jax.nn.leaky_relu(x, cfg.leaky_relu_alpha)

    if cfg.final_tanh:
        x = jnp.tanh(x)
    return x, new_state
