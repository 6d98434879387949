"""Metrics + sliding-window evaluation tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from semivl_tpu.evaluation.metrics import (
    intersection_and_union,
    miou_from_histograms,
)
from semivl_tpu.evaluation.predict import Evaluator, _chunk_sizes, evaluate

from synth_data import make_synth_dataset, synth_cfg
from tiny_model import tiny_bundle


def test_intersection_and_union_reference_parity(rng):
    """Cross-check against the reference's np.histogram formulation."""
    K = 5
    out = rng.randint(0, K, (2, 16, 16))
    tgt = rng.randint(0, K, (2, 16, 16))
    tgt[0, :2] = 255
    inter, union, target = intersection_and_union(out, tgt, K)

    o = out.reshape(-1).copy()
    t = tgt.reshape(-1)
    o[np.where(t == 255)[0]] = 255
    ref_inter, _ = np.histogram(o[np.where(o == t)[0]], bins=np.arange(K + 1))
    ref_out, _ = np.histogram(o, bins=np.arange(K + 1))
    ref_tgt, _ = np.histogram(t, bins=np.arange(K + 1))
    np.testing.assert_array_equal(inter, ref_inter)
    np.testing.assert_array_equal(union, ref_out + ref_tgt - ref_inter)
    np.testing.assert_array_equal(target, ref_tgt)


def test_miou_perfect_prediction():
    pred = np.array([[0, 1], [2, 2]])
    inter, union, _ = intersection_and_union(pred, pred, 3)
    miou, per_class = miou_from_histograms(inter.astype(np.float64),
                                           union.astype(np.float64))
    assert miou == pytest.approx(100.0, abs=1e-6)


def test_chunk_sizes():
    # exact decomposition: no padded zero-crops, bounded jit-spec set
    assert _chunk_sizes(1) == [1]
    assert _chunk_sizes(3) == [2, 1]
    assert _chunk_sizes(9) == [8, 1]
    assert _chunk_sizes(40) == [32, 8]
    assert _chunk_sizes(7, max_chunk=4) == [4, 2, 1]
    for n in range(1, 100):
        sizes = _chunk_sizes(n)
        assert sum(sizes) == n
        assert all(s & (s - 1) == 0 for s in sizes)


@pytest.fixture(scope='module')
def tiny_eval(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('evalds'))
    # 106: sliding_window edge crops stay >= 2 patches (22px), as in the
    # real Cityscapes geometry (edge crops 446/490 vs 801 grid)
    make_synth_dataset(root, n_val=2, size=(106, 106))
    bundle = tiny_bundle(num_classes=21, img_size=64, with_mcc=False)
    params = bundle.module.init(
        {'params': jax.random.PRNGKey(0), 'fp': jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3)), jnp.asarray(bundle.text_feats),
        method='init_variables')
    return root, bundle, params


@pytest.mark.parametrize('mode,stride', [
    ('zegclip_sliding_window', 48),
    ('sliding_window', None),
    ('padded_sliding_window', 48),
    ('original', None),
    ('center_crop', None),
])
@pytest.mark.slow
def test_eval_modes_run(tiny_eval, mode, stride):
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    if stride:
        cfg['stride'] = stride
    from semivl_tpu.data.dataset import SemiDataset
    import os
    ds = SemiDataset(cfg, 'val',
                     id_path=os.path.join(root, 'splits', 'val.txt'))
    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    miou, iou_class = evaluate(ev, ds, mode, cfg)
    assert 0.0 <= miou <= 100.0
    assert iou_class.shape == (21,)


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['zegclip_sliding_window', 'sliding_window'])
def test_device_accumulate_matches_host(tiny_eval, mode, rng):
    """The device-side canvas/finalize path must reproduce the host path's
    predictions exactly (same fp32 math: scatter-add, count division,
    matmul resize, argmax)."""
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    img = rng.randn(1, 106, 117, 3).astype(np.float32)
    mask_shape = (106, 117) if mode == 'sliding_window' else (97, 111)

    cfg_dev = dict(cfg, eval_device_accumulate=True)
    cfg_host = dict(cfg, eval_device_accumulate=False)
    ev_dev = Evaluator(bundle.module, params, bundle.text_feats, cfg_dev)
    ev_host = Evaluator(bundle.module, params, bundle.text_feats, cfg_host)
    pred_dev = ev_dev.predict(img, mask_shape, mode)
    pred_host = ev_host.predict(img, mask_shape, mode)
    assert pred_dev.shape == pred_host.shape == (1,) + mask_shape
    agree = (pred_dev == pred_host).mean()
    assert agree >= 0.999, agree


@pytest.mark.slow
def test_device_hist_matches_numpy(tiny_eval, rng):
    """The on-device histogram must reproduce intersection_and_union's
    integer counts exactly, including ignore (255) and padding handling."""
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    h, w = 97, 111
    pred = rng.randint(0, 21, (h, w)).astype(np.uint8)
    mask = rng.randint(0, 21, (h, w)).astype(np.uint8)
    mask[:5] = 255  # ignore rows
    # padded device layout: pred padding is arbitrary (argmax of zeros),
    # mask padding is 255 so it never counts
    pred_pad = np.zeros((128, 128), np.uint8)
    pred_pad[:h, :w] = pred
    mask_dev = ev.preupload_mask(mask)
    hist = np.asarray(ev._hist(jnp.asarray(pred_pad), mask_dev))
    inter, union, target = intersection_and_union(pred, mask, 21)
    np.testing.assert_array_equal(hist[0], inter)
    np.testing.assert_array_equal(hist[1], union)
    np.testing.assert_array_equal(hist[2], target)


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['zegclip_sliding_window',
                                  'sliding_window'])
def test_evaluate_device_metrics_matches_host(tiny_eval, mode):
    """evaluate() with on-device histograms + prefetch thread must produce
    the identical mIoU/per-class IoU as the host-metrics loop."""
    import os
    from semivl_tpu.data.dataset import SemiDataset
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    ds = SemiDataset(cfg, 'val',
                     id_path=os.path.join(root, 'splits', 'val.txt'))
    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    # flush_every=2 exercises mid-run accumulator fetch+reset on the
    # (len>2) synthetic val split, plus the final partial flush
    cfg_dev = dict(cfg, eval_device_metrics=True, eval_prefetch=True,
                   eval_hist_flush_every=2)
    cfg_host = dict(cfg, eval_device_metrics=False, eval_prefetch=False)
    miou_dev, iou_dev = evaluate(ev, ds, mode, cfg_dev)
    miou_host, iou_host = evaluate(ev, ds, mode, cfg_host)
    assert miou_dev == pytest.approx(miou_host, abs=1e-9)
    np.testing.assert_allclose(iou_dev, iou_host, atol=1e-9)


@pytest.mark.slow
def test_zegclip_window_count(tiny_eval):
    """Window grid matches the reference formula (supervised.py:74-75)."""
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    img = np.zeros((1, 106, 106, 3), np.float32)
    pred = ev.predict(img, (106, 106), 'zegclip_sliding_window')
    assert pred.shape == (1, 106, 106)


@pytest.mark.quick
def test_uint8_transport_matches_fp32(tiny_eval, rng):
    """uint8 val transport + on-device ImageNet normalisation must
    reproduce the host-normalised fp32 path's predictions (the only
    difference is where /255 + mean/std runs)."""
    from semivl_tpu.data.transforms import normalize

    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    raw = rng.randint(0, 256, (1, 106, 117, 3)).astype(np.uint8)
    img_f32 = normalize(raw[0])[None]
    mask_shape = (97, 111)

    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    pred_u8 = ev.predict(raw, mask_shape, 'zegclip_sliding_window')
    pred_f32 = ev.predict(img_f32, mask_shape, 'zegclip_sliding_window')
    agree = (pred_u8 == pred_f32).mean()
    assert agree >= 0.999, agree


@pytest.mark.slow
def test_padded_mode_uint8_pads_in_normalised_space(tiny_eval, rng):
    """padded_sliding_window zero-pads crops; the zeros must live in
    *normalised* space (mmseg pads the already-normalised image,
    supervised.py:41-67). With uint8 transport the evaluator must
    host-normalise before padding — uint8 zero-padding would normalise to
    -mean/std (~-2.1) and perturb predictions near pad borders."""
    from semivl_tpu.data.transforms import normalize

    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    raw = rng.randint(0, 256, (1, 106, 117, 3)).astype(np.uint8)
    img_f32 = normalize(raw[0])[None]
    mask_shape = (106, 117)

    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    pred_u8 = ev.predict(raw, mask_shape, 'padded_sliding_window')
    pred_f32 = ev.predict(img_f32, mask_shape, 'padded_sliding_window')
    np.testing.assert_array_equal(pred_u8, pred_f32)


@pytest.mark.slow
@pytest.mark.parametrize('mode', ['zegclip_sliding_window', 'sliding_window'])
def test_mesh_eval_matches_single_device(tiny_eval, mode, rng):
    """Round-3 multi-chip eval fast path: with a mesh, crop forwards run
    under shard_map (so Pallas decoders survive world > 1) and the device
    canvas is assembled as a psum of per-device partial canvases. The
    world=8 predictions must match the single-device device path."""
    import jax as _jax
    from jax.sharding import Mesh

    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    img = rng.randn(1, 106, 117, 3).astype(np.float32)
    mask_shape = (106, 117) if mode == 'sliding_window' else (97, 111)

    mesh = Mesh(np.array(_jax.devices()[:8]), ('data',))
    ev_mesh = Evaluator(bundle.module, params, bundle.text_feats, cfg,
                        mesh=mesh)
    ev_one = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    pred_mesh = ev_mesh.predict(img, mask_shape, mode)
    pred_one = ev_one.predict(img, mask_shape, mode)
    assert pred_mesh.shape == pred_one.shape == (1,) + mask_shape
    agree = (pred_mesh == pred_one).mean()
    assert agree >= 0.999, agree


@pytest.mark.slow
def test_mesh_eval_full_evaluate(tiny_eval):
    """evaluate() end-to-end on the mesh path (window counts not
    divisible by the world size exercise the validity masking)."""
    import os
    import jax as _jax
    from jax.sharding import Mesh
    from semivl_tpu.data.dataset import SemiDataset

    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    ds = SemiDataset(cfg, 'val',
                     id_path=os.path.join(root, 'splits', 'val.txt'))
    mesh = Mesh(np.array(_jax.devices()[:8]), ('data',))
    ev = Evaluator(bundle.module, params, bundle.text_feats, cfg, mesh=mesh)
    miou, iou_class = evaluate(ev, ds, 'zegclip_sliding_window', cfg)
    ev1 = Evaluator(bundle.module, params, bundle.text_feats, cfg)
    miou1, _ = evaluate(ev1, ds, 'zegclip_sliding_window', cfg)
    assert abs(miou - miou1) < 0.5, (miou, miou1)


def test_zegclip_small_image_device_falls_back_to_host(tiny_eval, rng):
    """Images with a dimension below crop_size must take the host zegclip
    path even under eval_device_accumulate: the reference feeds clipped
    natural-size crops (supervised.py:77-87, no zero pad), which the
    fixed-window device path cannot reproduce (and its 128-bucketed canvas
    would be smaller than the slice it scatters). Device- and host-config
    evaluators must agree exactly."""
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    cfg['stride'] = 48
    img = rng.randn(1, 49, 117, 3).astype(np.float32)  # h < crop
    mask_shape = (45, 111)

    ev_dev = Evaluator(bundle.module, params, bundle.text_feats,
                       dict(cfg, eval_device_accumulate=True))
    ev_host = Evaluator(bundle.module, params, bundle.text_feats,
                        dict(cfg, eval_device_accumulate=False))
    pred_dev = ev_dev.predict(img, mask_shape, 'zegclip_sliding_window')
    pred_host = ev_host.predict(img, mask_shape, 'zegclip_sliding_window')
    assert pred_dev.shape == (1,) + mask_shape
    np.testing.assert_array_equal(pred_dev, pred_host)


def test_flat_preupload_matches_padded(tiny_eval, rng):
    """Exact-byte flat uploads + on-device unpack must reproduce the
    host-padded buffers: image bytes identical in the valid region (the
    bucket pad is never read — window coords are clipped inside the
    image), mask buffers identical everywhere (the histogram reads every
    pixel, so pad must be exact 255)."""
    root, bundle, params = tiny_eval
    cfg = synth_cfg(root, crop_size=64)
    cfg['nclass'] = 21
    ev_flat = Evaluator(bundle.module, params, bundle.text_feats,
                        dict(cfg, eval_flat_upload=True))
    ev_pad = Evaluator(bundle.module, params, bundle.text_feats,
                       dict(cfg, eval_flat_upload=False))
    for h, w in [(97, 111), (128, 128), (106, 117), (513, 129)]:
        img = rng.randint(0, 256, (1, h, w, 3)).astype(np.uint8)
        a = np.asarray(ev_flat.preupload(img))
        b = np.asarray(ev_pad.preupload(img))
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(a[:, :h, :w], b[:, :h, :w])
        mask = rng.randint(0, 21, (h, w)).astype(np.int32)
        mask[0, :5] = 255
        ma = np.asarray(ev_flat.preupload_mask(mask))
        mb = np.asarray(ev_pad.preupload_mask(mask))
        np.testing.assert_array_equal(ma, mb)
    # non-uint8 images fall back to the padded path
    fimg = rng.randn(1, 97, 111, 3).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(ev_flat.preupload(fimg)),
                                  np.asarray(ev_pad.preupload(fimg)))
