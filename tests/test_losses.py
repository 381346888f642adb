"""Loss numerics golden-tested against torch CPU (independent implementation)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from openasr_tpu.ops.ctc import cal_ctc_loss, ctc_loss
from openasr_tpu.ops.losses import cal_ce_loss, cal_qua_loss, token_cross_entropy


def _rand_ctc_case(b=3, t=50, u=8, v=12, seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, t, v).astype(np.float32)
    logit_lengths = np.array([t, t - 7, t - 15], np.int32)[:b]
    target_lengths = rng.randint(1, u + 1, size=b).astype(np.int32)
    targets = rng.randint(0, v - 1, size=(b, u)).astype(np.int32)  # no blank
    return logits, logit_lengths, targets, target_lengths


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_matches_torch(seed):
    logits, ll, targets, tl = _rand_ctc_case(seed=seed)
    v = logits.shape[-1]

    got = np.asarray(ctc_loss(logits, ll, targets, tl))

    log_probs = F.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    want = F.ctc_loss(
        log_probs,
        torch.tensor(targets),
        torch.tensor(ll),
        torch.tensor(tl),
        reduction="none",
        blank=v - 1,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_repeated_labels():
    # repeated labels force blank-mediated paths (no skip transitions)
    b, t, v = 2, 20, 6
    rng = np.random.RandomState(3)
    logits = rng.randn(b, t, v).astype(np.float32)
    targets = np.array([[1, 1, 2, 2], [3, 3, 3, 3]], np.int32)
    tl = np.array([4, 4], np.int32)
    ll = np.array([20, 18], np.int32)
    got = np.asarray(ctc_loss(logits, ll, targets, tl))
    log_probs = F.log_softmax(torch.tensor(logits), dim=-1).transpose(0, 1)
    want = F.ctc_loss(
        log_probs, torch.tensor(targets), torch.tensor(ll), torch.tensor(tl),
        reduction="none", blank=v - 1,
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_ctc_sum_and_dummy_rows():
    logits, ll, targets, tl = _rand_ctc_case(seed=5)
    total = float(cal_ctc_loss(logits, ll, targets, tl))
    per = np.asarray(ctc_loss(logits, ll, targets, tl))
    assert np.isclose(total, per.sum(), rtol=1e-5)
    # zero-length target row contributes 0 to the sum
    tl2 = tl.copy()
    tl2[0] = 0
    total2 = float(cal_ctc_loss(logits, ll, targets, tl2))
    assert np.isclose(total2, per[1:].sum(), rtol=1e-4)


def test_ctc_gradients_match_torch():
    logits, ll, targets, tl = _rand_ctc_case(b=2, t=15, u=4, v=8, seed=7)

    g_jax = np.asarray(
        jax.grad(lambda x: cal_ctc_loss(x, ll, targets, tl))(jnp.asarray(logits))
    )

    x = torch.tensor(logits, requires_grad=True)
    log_probs = F.log_softmax(x, dim=-1).transpose(0, 1)
    loss = F.ctc_loss(
        log_probs, torch.tensor(targets), torch.tensor(ll), torch.tensor(tl),
        reduction="none", blank=logits.shape[-1] - 1,
    ).sum()
    loss.backward()
    np.testing.assert_allclose(g_jax, x.grad.numpy(), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("smooth", [0.0, 0.1])
def test_ce_matches_torch(smooth):
    rng = np.random.RandomState(0)
    b, u, v = 4, 9, 20
    logits = rng.randn(b, u, v).astype(np.float32)
    labels = rng.randint(0, v, size=(b, u)).astype(np.int32)
    paddings = (rng.rand(b, u) > 0.7).astype(np.float32)

    got = float(cal_ce_loss(logits, labels, paddings, smooth))

    lt = torch.tensor(logits)
    losses = F.cross_entropy(
        lt.view(-1, v), torch.tensor(labels).long().view(-1), reduction="none"
    ).view(b, u) * (1 - torch.tensor(paddings))
    want = losses.sum()
    if smooth > 0:
        logp = F.log_softmax(lt, dim=-1)
        ent = -logp.sum(-1) / v
        want = want * (1 - smooth) + (ent * (1 - torch.tensor(paddings))).sum() * smooth
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


@pytest.mark.parametrize("smooth", [0.0, 0.1])
def test_ce_gradients_match_torch(smooth):
    """The closed-form CE (lse/mean/one-hot reductions, no log-prob tensor)
    must autodiff to the textbook softmax-minus-target gradient."""
    rng = np.random.RandomState(1)
    b, u, v = 3, 7, 17
    logits = rng.randn(b, u, v).astype(np.float32)
    labels = rng.randint(0, v, size=(b, u)).astype(np.int32)
    paddings = (rng.rand(b, u) > 0.6).astype(np.float32)

    g_jax = np.asarray(
        jax.grad(lambda x: cal_ce_loss(x, labels, paddings, smooth))(
            jnp.asarray(logits)
        )
    )

    x = torch.tensor(logits, requires_grad=True)
    losses = F.cross_entropy(
        x.view(-1, v), torch.tensor(labels).long().view(-1), reduction="none"
    ).view(b, u) * (1 - torch.tensor(paddings))
    want = losses.sum()
    if smooth > 0:
        logp = F.log_softmax(x, dim=-1)
        ent = -logp.sum(-1) / v
        want = want * (1 - smooth) + (
            ent * (1 - torch.tensor(paddings))
        ).sum() * smooth
    want.backward()
    np.testing.assert_allclose(g_jax, x.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_token_ce_masks_padding():
    logits = np.random.randn(1, 3, 5).astype(np.float32)
    labels = np.array([[1, 2, 3]], np.int32)
    paddings = np.array([[0, 0, 1]], np.float32)
    per = np.asarray(token_cross_entropy(logits, labels, paddings))
    assert per[0, 2] == 0.0 and per[0, 0] > 0


def test_qua_loss():
    a = np.array([3.0, 4.0])
    b = np.array([0.0, 0.0])
    assert np.isclose(float(cal_qua_loss(a, b)), 5.0)


def test_ctc_zero_infinity_for_impossible_alignment():
    """T shorter than the label structure requires -> loss and grads zeroed
    (torch zero_infinity semantics) instead of 1e30 poisoning the batch."""
    import jax
    import jax.numpy as jnp
    from openasr_tpu.ops.ctc import cal_ctc_loss

    rng = np.random.RandomState(3)
    b, t, v, u = 2, 4, 6, 4
    logits = jnp.asarray(rng.randn(b, t, v), jnp.float32)
    targets = jnp.asarray([[1, 1, 1, 1], [1, 2, 3, 1]], jnp.int32)
    # row 0 needs >= 7 frames (repeats), has 4 -> impossible; row 1 feasible
    ll = jnp.asarray([4, 4], jnp.int32)
    tl = jnp.asarray([4, 4], jnp.int32)

    def f(lg):
        return cal_ctc_loss(lg, ll, targets, tl)

    loss, grads = jax.value_and_grad(f)(logits)
    assert np.isfinite(float(loss)) and float(loss) < 1e9
    g = np.asarray(grads)
    assert np.all(np.abs(g[0]) == 0.0), "impossible row must not produce grads"
    assert np.any(np.abs(g[1]) > 0.0)
