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


def test_freq_mask_wider_than_bins_follows_torch_slice_semantics():
    """freq_mask_width > num bins (e.g. the default width 27 on 23-bin
    features): the reference's negative start hits Python slice semantics
    — it wraps to v+start (masking the last |start| bins), or clamps to 0
    when start <= -v (reference: src/blocks/sp_layers.py:58-64).  Oracle:
    replay the implementation's exact uniform draws through a torch-style
    slice in numpy and require the identical mask."""
    cfg = SpecAugConfig(
        freq_mask_num=2, freq_mask_width=30,
        time_mask_num=0, time_mask_width=0,
    )
    rng = np.random.RandomState(1)
    b, t, v = 4, 12, 8
    feats = rng.randn(b, t, v).astype(np.float32) + 5.0
    lengths = np.full((b,), t, np.int32)
    any_wrapped = any_clamped = False
    for seed in range(16):
        key = jax.random.PRNGKey(seed)
        out = np.asarray(
            spec_aug(key, jnp.asarray(feats), jnp.asarray(lengths), cfg)
        )
        # replay the implementation's draw (spec_aug splits key -> k_f)
        k_f, _ = jax.random.split(key)
        u = np.asarray(jax.random.uniform(k_f, (cfg.freq_mask_num, 2, b)))
        expected = feats.copy()
        freq_means = feats.mean(axis=-1)
        for i in range(cfg.freq_mask_num):
            widths = (cfg.freq_mask_width * u[i, 0]).astype(np.int64)
            starts = ((v - widths) * u[i, 1]).astype(np.int64)
            for j in range(b):
                s, w = int(starts[j]), int(widths[j])
                any_wrapped |= -v < s < 0
                any_clamped |= s <= -v
                # torch tensor slicing == python slicing (negative start
                # wraps; below -v clamps to 0; s+w >= v whenever s < 0)
                expected[j, :, s : s + w] = freq_means[j][:, None]
        # rtol: numpy vs XLA mean-reduction rounding on the fill values
        np.testing.assert_allclose(
            out, expected, rtol=1e-6, err_msg=f"seed {seed}"
        )
    assert any_wrapped, "test never exercised the wrap branch"
    assert any_clamped, "test never exercised the clamp branch"
