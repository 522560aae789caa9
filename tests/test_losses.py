import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multitalent_tpu.training import losses as L


def test_one_hot_and_confusion():
    labels = jnp.array([[[0, 1], [2, 1]]])  # (1, 2, 2)
    probs = L.one_hot_last(labels, 3)  # perfect prediction
    tp, fp, fn, tn = L.get_tp_fp_fn_tn(probs, labels, batch_dice=True)
    np.testing.assert_allclose(tp, [1, 2, 1])
    np.testing.assert_allclose(fp, [0, 0, 0])
    np.testing.assert_allclose(fn, [0, 0, 0])


def test_soft_dice_perfect_prediction():
    labels = jax.random.randint(jax.random.PRNGKey(0), (2, 4, 4, 4), 0, 3)
    logits = 100.0 * L.one_hot_last(labels, 3) - 50.0
    loss = L.soft_dice_loss(logits, labels, batch_dice=True, do_bg=False)
    assert float(loss) == pytest.approx(-1.0, abs=1e-3)


def test_robust_ce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 4, 4, 4, 5)).astype(np.float32)
    labels = rng.integers(0, 5, (2, 4, 4, 4))
    ours = float(L.robust_cross_entropy(jnp.array(logits), jnp.array(labels)))
    # torch CE expects (B, C, ...) channels-first
    t = torch.nn.CrossEntropyLoss()(
        torch.tensor(logits).permute(0, 4, 1, 2, 3), torch.tensor(labels))
    assert ours == pytest.approx(float(t), abs=1e-5)


def test_ds_loss_weights():
    w = L.ds_loss_weights(4)
    assert w[-1] == 0
    assert w[0] > w[1] > w[2] > 0
    assert w.sum() == pytest.approx(1.0)
    w2 = L.ds_loss_weights(4, mask_lowest=False)
    assert w2[-1] > 0


def test_multitalent_loss_matches_reference_loop():
    """Vectorized masked multi-head loss must equal the reference's per-sample,
    per-region torch loop (BCEWithLogitsLoss mean + batch dice summed over channels)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, S, R = 3, (4, 4, 4), 5
    regions = {"a": (1,), "b": (2,), "ab": (1, 2), "c": (3,), "d": (4,)}
    region_idx = {"a": 0, "b": 1, "ab": 2, "c": 3, "d": 4}
    mat = L.build_label_region_matrix(regions, region_idx, num_labels=4)

    logits = rng.standard_normal((B, *S, R)).astype(np.float32)
    labels = rng.integers(0, 5, (B, *S))
    valid = [["a", "b", "ab"], ["c"], ["a", "d"]]
    vmask = np.zeros((B, R), np.float32)
    for b, regs in enumerate(valid):
        for r in regs:
            vmask[b, region_idx[r]] = 1

    ours_loss, ours_ce, ours_dc = L.multitalent_loss(
        jnp.array(logits), jnp.array(labels), jnp.array(vmask), jnp.array(mat))

    # reference-style loop in torch (channels-first)
    tl = torch.tensor(logits).permute(0, 4, 1, 2, 3)
    tt = torch.tensor(labels)
    sig = torch.sigmoid(tl)
    bce = torch.nn.BCEWithLogitsLoss()
    tp = torch.zeros(B, R)
    fp = torch.zeros(B, R)
    fn = torch.zeros(B, R)
    ce_ref = 0.0
    for b in range(B):
        for r in valid[b]:
            c = region_idx[r]
            gt = torch.zeros_like(tt[b], dtype=torch.float32)
            for l in regions[r]:
                gt = torch.bitwise_or(gt.bool(), tt[b] == l).float()
            ce_ref = ce_ref + bce(tl[b, c], gt)
            tp[b, c] += torch.sum(sig[b, c] * gt)
            fp[b, c] += torch.sum(sig[b, c] * (1 - gt))
            fn[b, c] += torch.sum((1 - sig[b, c]) * gt)
    tp, fp, fn = tp.sum(0), fp.sum(0), fn.sum(0)
    dc_ref = (2 * tp / torch.clamp(2 * tp + fp + fn, min=1e-7)).sum()
    loss_ref = float(ce_ref - dc_ref)

    assert float(ours_ce) == pytest.approx(float(ce_ref), rel=1e-5)
    assert float(ours_dc) == pytest.approx(float(dc_ref), rel=1e-5)
    assert float(ours_loss) == pytest.approx(loss_ref, rel=1e-5)


def test_multitalent_invalid_regions_do_not_contribute():
    B, S, R = 2, (4, 4), 3
    mat = L.build_label_region_matrix({"x": (1,), "y": (2,), "z": (3,)},
                                      {"x": 0, "y": 1, "z": 2}, num_labels=3)
    rng = np.random.default_rng(2)
    logits = jnp.array(rng.standard_normal((B, *S, R)).astype(np.float32))
    labels = jnp.array(rng.integers(0, 4, (B, *S)))
    no_valid = jnp.zeros((B, R))
    loss, ce, dc = L.multitalent_loss(logits, labels, no_valid, jnp.array(mat))
    assert float(ce) == 0.0
    assert float(dc) == 0.0

    # changing logits in an invalid channel must not change the loss
    vmask = jnp.array([[1, 0, 0], [1, 0, 0]], jnp.float32)
    l1, _, _ = L.multitalent_loss(logits, labels, vmask, jnp.array(mat))
    logits2 = logits.at[..., 2].add(123.0)
    l2, _, _ = L.multitalent_loss(logits2, labels, vmask, jnp.array(mat))
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)


def test_deep_supervision_loss():
    outs = [jnp.zeros((1, 4, 4, 4, 2)), jnp.zeros((1, 2, 2, 2, 2))]
    tgts = [jnp.zeros((1, 4, 4, 4), jnp.int32), jnp.zeros((1, 2, 2, 2), jnp.int32)]
    w = L.ds_loss_weights(2, mask_lowest=False)
    val = L.deep_supervision_loss(outs, tgts, lambda o, t: L.robust_cross_entropy(o, t), w)
    assert np.isfinite(float(val))


def test_topk_and_focal_and_gdl_finite():
    rng = np.random.default_rng(3)
    logits = jnp.array(rng.standard_normal((2, 4, 4, 3)).astype(np.float32))
    labels = jnp.array(rng.integers(0, 3, (2, 4, 4)))
    for fn in (lambda: L.topk_cross_entropy(logits, labels),
               lambda: L.focal_ce_loss(logits, labels),
               lambda: L.gdl_loss(logits, labels)):
        assert np.isfinite(float(fn()))
