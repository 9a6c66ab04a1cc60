"""Loss-function and augmentation parity vs torch reference semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mpgan_tpu.ops.augment import AugmentConfig, augment
from mpgan_tpu.training.losses import d_loss, g_loss, gradient_penalty


def test_d_g_losses_match_torch(torch):
    """og (BCE) / ls (MSE) / w / hinge D and G losses equal the torch
    formulas (train.py:331-395, 465-476)."""
    rng = np.random.RandomState(0)
    real = rng.uniform(0.01, 0.99, (16, 1)).astype(np.float32)
    fake = rng.uniform(0.01, 0.99, (16, 1)).astype(np.float32)
    t_real, t_fake = torch.from_numpy(real), torch.from_numpy(fake)
    ones, zeros = torch.ones(16, 1), torch.zeros(16, 1)

    bce, mse = torch.nn.BCELoss(), torch.nn.MSELoss()
    expected = {
        "og": (bce(t_real, ones) + bce(t_fake, zeros)).item(),
        "ls": (mse(t_real, ones) + mse(t_fake, zeros)).item(),
        "w": (-t_real.mean() + t_fake.mean()).item(),
        "hinge": (
            torch.nn.ReLU()(1 - t_real).mean() + torch.nn.ReLU()(1 + t_fake).mean()
        ).item(),
    }
    for loss_name, want in expected.items():
        total, parts = d_loss(loss_name, jnp.asarray(real), jnp.asarray(fake))
        np.testing.assert_allclose(float(total), want, rtol=1e-5)
        np.testing.assert_allclose(
            float(parts["Dr"]) + float(parts["Df"]), want, rtol=1e-5
        )

    g_expected = {
        "og": bce(t_fake, ones).item(),
        "ls": mse(t_fake, ones).item(),
        "w": (-t_fake.mean()).item(),
        "hinge": (-t_fake.mean()).item(),
    }
    for loss_name, want in g_expected.items():
        np.testing.assert_allclose(float(g_loss(loss_name, jnp.asarray(fake))), want, rtol=1e-5)


def test_gradient_penalty_analytic():
    """For D(x) = <w, x>, grad norm is |w| everywhere, so
    gp = lambda * (|w| - 1)^2 independent of the interpolation draw
    (train.py:286-324)."""
    w = np.full((5,), 0.6, np.float32)  # |w| = 0.6 * sqrt(5)
    d_fn = lambda x: (x.reshape(x.shape[0], -1) @ jnp.asarray(w))[:, None]
    real = jnp.asarray(np.random.RandomState(0).randn(8, 5, 1).astype(np.float32))
    fake = jnp.asarray(np.random.RandomState(1).randn(8, 5, 1).astype(np.float32))
    gp = gradient_penalty(d_fn, jax.random.PRNGKey(0), real, fake, gp_lambda=10.0)
    want = 10.0 * (np.linalg.norm(w) - 1) ** 2
    np.testing.assert_allclose(float(gp), want, rtol=1e-5)


@pytest.mark.parametrize("which", ["f", "r90", "t", "s"])
def test_augment_matches_reference_semantics(reference_path, torch, which):
    """Each augmentation against the reference implementation with the
    randomness pinned: p=1 (always mixed) and the reference's random draws
    replicated by monkeypatching torch's samplers onto fixed values."""
    from mpgan import augment as ref_aug

    rng = np.random.RandomState(3)
    x = rng.randn(4, 10, 3).astype(np.float32)

    class A:  # reference args object
        device = "cpu"
        num_hits = 10
        translate_ratio = 0.125
        scale_sd = 0.125
        aug_r90 = which == "r90"
        aug_f = which == "f"
        aug_t = which == "t"
        aug_s = which == "s"

    cfg = AugmentConfig(
        aug_t=A.aug_t, aug_f=A.aug_f, aug_r90=A.aug_r90, aug_s=A.aug_s,
        translate_ratio=A.translate_ratio, scale_sd=A.scale_sd,
    )

    torch.manual_seed(0)
    ref_out = ref_aug.augment(A, torch.from_numpy(x.copy()), p=1.0).numpy()
    ours = np.asarray(augment(cfg, jax.random.PRNGKey(0), jnp.asarray(x), 1.0))
    assert ours.shape == ref_out.shape

    # randomness differs (torch vs jax PRNG) — check the transform's
    # *invariants* instead of bitwise equality
    if which == "f":
        # flips: |coords| preserved, intensity untouched
        np.testing.assert_allclose(np.abs(ours[..., :2]), np.abs(x[..., :2]), rtol=1e-5)
        np.testing.assert_allclose(ours[..., 2], x[..., 2], rtol=1e-6)
        np.testing.assert_allclose(np.abs(ref_out[..., :2]), np.abs(x[..., :2]), rtol=1e-5)
    elif which == "r90":
        # rotations: radius preserved, intensity untouched
        r_ours = np.linalg.norm(ours[..., :2], axis=-1)
        np.testing.assert_allclose(r_ours, np.linalg.norm(x[..., :2], axis=-1), rtol=1e-4)
        np.testing.assert_allclose(ours[..., 2], x[..., 2], rtol=1e-5)
    elif which == "t":
        # translations: per-sample constant shift on coords only
        shift = ours[..., :2] - x[..., :2]
        np.testing.assert_allclose(
            shift, np.broadcast_to(shift[:, :1, :], shift.shape), rtol=1e-4, atol=1e-6
        )
        assert np.abs(shift).max() <= 0.5 * A.translate_ratio + 1e-6
        np.testing.assert_allclose(ours[..., 2], x[..., 2], rtol=1e-6)
    elif which == "s":
        # scalings: per-sample constant positive scale on coords
        scale = ours[..., :2] / np.where(np.abs(x[..., :2]) > 1e-8, x[..., :2], 1.0)
        med = np.median(scale.reshape(4, -1), axis=1)
        assert (med > 0).all()
        np.testing.assert_allclose(ours[..., 2], x[..., 2], rtol=1e-6)
