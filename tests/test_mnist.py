"""MNIST workload tests: MoNet FID machinery (using the reference's shipped
classifier weights + moments when available) and the MNIST training loop."""

import numpy as np
import pytest

from mpgan_tpu.data.mnist import MNISTGraphDataset
from mpgan_tpu.evaluation.mnist_fid import (
    build_graph,
    get_fid,
    gmm_conv,
    graclus,
    max_pool,
    monet_activations,
    normalized_cut_weights,
)
from mpgan_tpu.training.config import from_args_dict
from mpgan_tpu.training.mnist_loop import MNISTDatasetView, MNISTTrainer


def _resources(reference_path):
    res = reference_path / "mnist/evaluation_resources"
    if not res.exists():
        pytest.skip("reference mnist resources unavailable")
    return str(res)


def test_build_graph():
    cloud = np.array([[0.0, 0.0, 0.3], [0.1, 0.0, 0.2], [0.45, 0.45, 0.1]])
    x, pos, edges = build_graph(cloud)
    assert x.shape == (3, 1)
    # nodes 0,1 are within the cutoff, node 2 is isolated; no self loops
    pairs = {tuple(e) for e in edges}
    assert (0, 1) in pairs and (1, 0) in pairs
    assert not any(a == b for a, b in pairs)
    np.testing.assert_allclose(pos[0], [14, 14])


def test_graclus_and_pool():
    edges = np.array([[0, 1], [1, 0], [2, 3], [3, 2]])
    pos = np.array([[0.0, 0], [1, 0], [5, 0], [6, 0]])
    w = normalized_cut_weights(edges, pos, 4)
    cluster = graclus(edges, w, 4)
    assert cluster[0] == cluster[1] and cluster[2] == cluster[3]
    assert cluster[0] != cluster[2]
    x = np.arange(8.0).reshape(4, 2)
    nx, npos, ne = max_pool(cluster, x, pos, edges)
    assert nx.shape == (2, 2)
    np.testing.assert_allclose(nx[0], [2, 3])  # max of rows 0,1
    np.testing.assert_allclose(npos[0], [0.5, 0])
    assert len(ne) == 0  # intra-cluster edges collapse to self loops, removed


def test_gmm_conv_basic():
    # single kernel, identity-ish: w_k(e)=exp(0)=1 when e == mu
    x = np.array([[1.0], [2.0]])
    edges = np.array([[0, 1], [1, 0]])
    pseudo = np.zeros((2, 2))
    g = np.array([[1.0]])  # in=1, K*out=1
    mu = np.zeros((1, 2))
    sigma = np.ones((1, 2))
    root = np.array([[0.5]])
    bias = np.zeros(1)
    out = gmm_conv(x, edges, pseudo, g, mu, sigma, root, bias)
    # out_0 = mean(x_1 * 1) + 0.5*x_0 = 2 + 0.5; out_1 = 1 + 1
    np.testing.assert_allclose(out, [[2.5], [2.0]])


def test_monet_activations_shipped_weights(reference_path):
    res = _resources(reference_path)
    from mpgan_tpu.evaluation.mnist_fid import load_resources

    params, mu2, sigma2 = load_resources(res, 75, 3)
    assert mu2.shape == (128,)
    ds = MNISTGraphDataset(None, 75, num=3, synthetic_num_samples=4)
    acts = monet_activations(params, np.asarray(ds.X[0], np.float64))
    assert acts.shape == (128,)
    assert np.isfinite(acts).all()


def test_fid_discriminates(reference_path):
    res = _resources(reference_path)
    ds = MNISTGraphDataset(None, 75, num=3, synthetic_num_samples=60)
    clouds = np.asarray(ds.X)
    fid_blobs = get_fid(clouds, 75, 3, res, eval_size=50)
    noise = np.random.default_rng(0).uniform(-0.5, 0.5, clouds.shape)
    fid_noise = get_fid(noise.astype(np.float32), 75, 3, res, eval_size=50)
    assert np.isfinite(fid_blobs) and np.isfinite(fid_noise)
    # sensitive to the input distribution, deterministic across calls
    assert abs(fid_blobs - fid_noise) > 1.0
    assert get_fid(clouds, 75, 3, res, eval_size=50) == pytest.approx(fid_blobs)


def test_mnist_trainer_smoke(tmp_path, reference_path):
    args = from_args_dict(
        dict(
            name="mnist_smoke", model="mpgan", dataset="mnist", num_hits=20,
            hidden_node_size=8, fe=[12], fn=[16], batch_size=16, num_epochs=1,
            save_epochs=1, save_model_epochs=1, fid_eval_samples=20,
            mask_c=False, dir_path=str(tmp_path), gen_dropout=0.0,
            disc_dropout=0.0, load_model=False, save_zero=False,
            mnist_eval_resources="",
        )
    )
    args.mask = False
    args.mask_c = False
    ds = MNISTGraphDataset(None, 20, num=3, synthetic_num_samples=64)
    view = MNISTDatasetView(ds)
    trainer = MNISTTrainer(args, train_dataset=view, valid_dataset=view)
    trainer.train()
    assert len(trainer.losses["G"]) == 1
    assert (tmp_path / "mnist_smoke" / "models" / "state_1.npz").exists()
