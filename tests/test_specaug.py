"""SpecAugment behavior tests (mean-fill semantics of the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from openasr_tpu.ops.specaug import SpecAugConfig, spec_aug


def _example():
    rng = np.random.RandomState(0)
    b, t, v = 4, 50, 16
    feats = rng.randn(b, t, v).astype(np.float32) + 5.0
    lengths = np.array([50, 40, 30, 20], np.int32)
    for i, l in enumerate(lengths):
        feats[i, l:] = 0.0
    return feats, lengths


def test_spec_aug_masks_with_means():
    feats, lengths = _example()
    cfg = SpecAugConfig(freq_mask_num=1, freq_mask_width=8, time_mask_num=1, time_mask_width=10)
    out = np.asarray(spec_aug(jax.random.PRNGKey(3), feats, lengths, cfg))
    assert out.shape == feats.shape
    changed = np.any(out != feats)
    assert changed

    # every changed value equals either the freq-mean or time-mean fill
    freq_means = feats.mean(-1)
    time_means = feats.sum(1) / lengths[:, None]
    diff = out != feats
    bs, ts, vs = np.where(diff)
    for b_, t_, v_ in zip(bs[:200], ts[:200], vs[:200]):
        ok = np.isclose(out[b_, t_, v_], freq_means[b_, t_]) or np.isclose(
            out[b_, t_, v_], time_means[b_, v_]
        )
        assert ok, (b_, t_, v_, out[b_, t_, v_])


def test_spec_aug_no_masks_is_identity():
    feats, lengths = _example()
    cfg = SpecAugConfig(0, 0, 0, 0)
    out = np.asarray(spec_aug(jax.random.PRNGKey(0), feats, lengths, cfg))
    np.testing.assert_array_equal(out, feats)


def test_spec_aug_time_masks_stay_in_valid_region():
    feats, lengths = _example()
    cfg = SpecAugConfig(freq_mask_num=0, freq_mask_width=0, time_mask_num=2, time_mask_width=10)
    for seed in range(5):
        out = np.asarray(spec_aug(jax.random.PRNGKey(seed), feats, lengths, cfg))
        for i, l in enumerate(lengths):
            np.testing.assert_array_equal(out[i, l:], feats[i, l:])


def test_spec_aug_deterministic_per_key():
    feats, lengths = _example()
    cfg = SpecAugConfig(2, 8, 2, 10)
    a = np.asarray(spec_aug(jax.random.PRNGKey(7), feats, lengths, cfg))
    b = np.asarray(spec_aug(jax.random.PRNGKey(7), feats, lengths, cfg))
    np.testing.assert_array_equal(a, b)


def test_time_mask_wider_than_utterance_is_skipped():
    """When the drawn time-mask width exceeds feat_length, the reference's
    negative-start slice is empty — no mask.  A naive negative start would
    blank frames [0, start+width), wiping most of a short utterance."""
    from openasr_tpu.ops.specaug import SpecAugConfig, spec_aug

    cfg = SpecAugConfig(
        freq_mask_num=0, freq_mask_width=0,
        time_mask_num=2, time_mask_width=10**9,
    )
    rng = np.random.RandomState(0)
    b, t, v = 3, 16, 8
    feats = rng.randn(b, t, v).astype(np.float32)
    lengths = np.array([8, 6, 4], np.int32)
    for seed in range(8):
        out = np.asarray(
            spec_aug(jax.random.PRNGKey(seed), jnp.asarray(feats),
                     jnp.asarray(lengths), cfg)
        )
        for i, n in enumerate(lengths):
            np.testing.assert_array_equal(
                out[i, :n], feats[i, :n],
                err_msg=f"seed {seed} row {i}: oversized mask applied",
            )
