"""Checkpoint round-trips, .conv shim parity, data pipeline and codecs."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

import jax

from spectralae.core.config import Config, LayerParams
from spectralae.core.types import initial_spec, init_params, init_opt_state
from spectralae.io import checkpoint as ckpt
from spectralae.data import pipeline


def setup(nx=16, d=3, m=4):
    cfg = Config(nx=nx, ny=nx, d=d,
                 layer=LayerParams(depth=m, lk=0, ll=0, scale=2, rmax=0.5))
    spec = initial_spec(cfg)
    params = init_params(jax.random.key(0), spec, 0.5)
    return cfg, spec, params


def test_checkpoint_roundtrip(tmp_path):
    cfg, spec, params = setup()
    opt = init_opt_state(params)
    ckpt.save(tmp_path / "ck", params, spec, opt, extra={"step": 7})
    p2, spec2, opt2, extra = ckpt.load(tmp_path / "ck")
    assert extra["step"] == 7
    assert spec2 == spec
    for a, b in zip(params.stages, p2.stages):
        np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))
        np.testing.assert_array_equal(np.asarray(a.b), np.asarray(b.b))
    for a, b in zip(opt.mom.stages, opt2.mom.stages):
        np.testing.assert_array_equal(np.asarray(a.c), np.asarray(b.c))


def test_checkpoint_shape_mismatch_fails_loudly(tmp_path):
    cfg, spec, params = setup()
    ckpt.save(tmp_path / "ck", params, spec)
    import json
    man = json.loads((tmp_path / "ck" / "manifest.json").read_text())
    man["shapes"]["stage0/c"] = [1, 2, 3, 4]
    (tmp_path / "ck" / "manifest.json").write_text(json.dumps(man))
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt.load(tmp_path / "ck")


def test_conv_shim_reference_layout(tmp_path):
    """The .conv payload is (m,d,k,l) row-major floats then M biases —
    byte-for-byte the reference's SaveLoad_conv (netlib.cpp:236-253)."""
    cfg, spec, params = setup()
    pe, pd = ckpt.save_pair_conv(params, spec, 0, tmp_path)
    assert pe.name == "C_weights_0_in_D=3_M=4_Lk=0_Ll=0_S=2.conv"
    # decoder files carry the signed (negative) scale — reference passes
    # scale[N-n_l] directly (autoencoder.cpp:362)
    assert pd.name == "C_weights_0_out_D=4_M=3_Lk=0_Ll=0_S=-2.conv"
    enc = params.stages[0]
    raw = np.fromfile(pe, dtype="<f4")
    m, d, nk, nl = enc.c.shape
    np.testing.assert_array_equal(raw[: m * d * nk * nl],
                                  np.asarray(enc.c).ravel())
    np.testing.assert_array_equal(raw[m * d * nk * nl:], np.asarray(enc.b))
    # round-trip load restores the pair
    blank = init_params(jax.random.key(9), spec, 0.0)
    loaded = ckpt.load_pair_conv(blank, spec, 0, tmp_path)
    np.testing.assert_array_equal(np.asarray(loaded.stages[0].c),
                                  np.asarray(enc.c))


def test_synthetic_source_and_codecs():
    src = pipeline.synthetic_frames(16, 16, seed=0)
    f = next(src)
    assert f.shape == (16, 16, 3) and f.dtype == np.uint8
    t = pipeline.frame_to_tensor(f)
    assert t.shape == (3, 16, 16) and t.dtype == np.float32
    # codec round trip is exact for uint8-representable values
    back = pipeline.tensor_to_frame(t)
    np.testing.assert_array_equal(back, f)


def test_feature_and_kernel_images():
    fmap = np.array([[1.7, -2.0], [300.0, 0.0]], np.float32)
    img = pipeline.feature_to_image(fmap)
    assert img.dtype == np.uint8
    assert img[0, 0] == 1 and img[0, 1] == 44  # 300 wraps (quirk parity)
    k = np.array([[0.5, -0.5]], np.float32)
    kimg = pipeline.kernel_to_image(k)
    assert kimg[0, 0] == 178 and kimg[1, 0] == 178


def test_prefetcher_batches_and_stops():
    src = iter([np.zeros((8, 8, 3), np.uint8)] * 6)
    pf = pipeline.DevicePrefetcher(src, nx=8, ny=8, batch=2)
    batches = list(pf)
    assert len(batches) == 3
    assert batches[0].shape == (2, 3, 8, 8)
    pf.close()


def _native_or_skip(*, need_batch=False, need_yuv=False):
    """Build the native lib if the toolchain allows; skip with a precise
    reason otherwise — the ONE copy of the build/cache-reset bootstrap
    (three divergent copies previously risked testing a stale library)."""
    from spectralae.data import native
    root = Path(__file__).resolve().parents[1]
    if not native.available():
        r = subprocess.run(["make", "-C", str(root / "native")],
                           capture_output=True)
        if r.returncode != 0:
            pytest.skip("native toolchain unavailable")
        native._lib = None
    if not native.available():
        pytest.skip("native lib not built")
    if need_batch and not native.has_batch():
        pytest.skip("native lib lacks sae_batch_to_tensor (stale build)")
    if need_yuv and not native.has_yuv():
        pytest.skip("native lib lacks sae_yuv_to_bgr (stale build)")
    return native


def test_native_codec_parity_when_built():
    native = _native_or_skip()
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        native.frame_to_tensor(img),
        img.astype(np.float32).transpose(2, 1, 0))
    spin = rng.normal(128, 90, size=(3, 24, 20)).astype(np.float32)
    np.testing.assert_array_equal(
        native.tensor_to_frame(spin),
        np.clip(np.round(spin.transpose(2, 1, 0)), 0, 255).astype(np.uint8))
    # compare against the explicit numpy index map (pipeline.resize_nn
    # itself dispatches to the native stage when built, so comparing the
    # two would be tautological)
    h, w = img.shape[:2]
    ri, ci = np.arange(10) * h // 10, np.arange(12) * w // 12
    np.testing.assert_array_equal(native.resize_nn(img, 12, 10),
                                  img[ri][:, ci])


def test_native_batch_stage_parity_when_built():
    """The threaded C++ batch resize+convert equals the per-frame numpy
    path (resize_nn -> frame_to_tensor), frame for frame."""
    native = _native_or_skip(need_batch=True)
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, size=(6, 37, 23, 3), dtype=np.uint8)
    for nx, ny in ((16, 12), (23, 37)):
        got = native.batch_to_tensor(imgs, nx, ny, n_threads=3)
        want = np.stack([
            np.ascontiguousarray(
                pipeline.resize_nn(f, nx, ny)
                .astype(np.float32).transpose(2, 1, 0))
            for f in imgs])
        assert got.shape == (6, 3, nx, ny)
        np.testing.assert_array_equal(got, want)


def test_prefetcher_uses_native_batch_stage_when_available():
    _native_or_skip(need_batch=True)
    src = pipeline.synthetic_frames(40, 40, seed=3)
    pf = pipeline.DevicePrefetcher(src, 16, 16, batch=4)
    batch = np.asarray(next(pf))
    pf.close()
    src2 = pipeline.synthetic_frames(40, 40, seed=3)
    want = np.stack([
        pipeline.frame_to_tensor(pipeline.resize_nn(next(src2), 16, 16))
        for _ in range(4)])
    np.testing.assert_array_equal(batch, want)


def test_metrics_logger_and_timer(tmp_path):
    from spectralae.core.profiling import MetricsLogger, StepTimer
    log = MetricsLogger(tmp_path / "m.jsonl", echo=False)
    log.log(step=1, loss=0.5)
    log.log(step=2, loss=0.25)
    log.close()
    import json
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[1] == {"step": 2, "loss": 0.25}
    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    assert t.median_ms >= 0 and t.steps_per_sec > 0


@pytest.mark.slow   # jax.profiler trace setup ~60 s on this single-core rig
def test_device_trace_smoke(tmp_path):
    import jax.numpy as jnp
    import jax
    from spectralae.core.profiling import device_trace
    with device_trace(tmp_path):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    import os
    assert any(os.scandir(tmp_path))  # trace files written


def test_camera_frames_with_stubbed_videocapture(monkeypatch):
    """A2 camera input (autoencoder.cpp:54, 123-125): cv2 is absent in this
    image, so stub the module — camera_frames must pull frames until the
    capture reports failure, and the frames must flow through the
    resize/tensor pipeline like the reference's per-frame loop."""
    import sys
    import types
    import numpy as np
    from spectralae.data import pipeline

    frames = [np.full((6, 8, 3), i, np.uint8) for i in range(3)]

    class FakeCapture:
        def __init__(self, index):
            assert index == 0
            self._i = 0

        def read(self):
            if self._i >= len(frames):
                return False, None
            self._i += 1
            return True, frames[self._i - 1]

    fake_cv2 = types.ModuleType("cv2")
    fake_cv2.VideoCapture = FakeCapture
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)

    got = list(pipeline.camera_frames())
    assert len(got) == 3
    np.testing.assert_array_equal(got[1], frames[1])
    # the frame feeds the same path the engine consumes
    x = pipeline.frame_to_tensor(pipeline.resize_nn(got[2], 4, 4))
    assert x.shape == (3, 4, 4)
    assert float(x.max()) == 2.0


def test_camera_frames_errors_without_cv2(monkeypatch):
    import builtins
    import sys
    import pytest
    from spectralae.data import pipeline
    monkeypatch.delitem(sys.modules, "cv2", raising=False)
    real_import = builtins.__import__

    def no_cv2(name, *a, **k):
        if name == "cv2":
            raise ImportError("No module named cv2")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_cv2)
    with pytest.raises(RuntimeError, match="synthetic_frames"):
        next(pipeline.camera_frames())


def _write_y4m(path, frames_yuv, w, h, cs="420"):
    """frames_yuv: list of (y, u, v) uint8 planes."""
    with open(path, "wb") as fh:
        fh.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A1:1 C{cs}\n".encode())
        for y, u, v in frames_yuv:
            fh.write(b"FRAME\n")
            fh.write(y.tobytes() + u.tobytes() + v.tobytes())


def test_y4m_source_monochrome_and_shapes(tmp_path):
    """Neutral chroma (U=V=128) must decode to gray BGR with the BT.601
    luma transform; C420 and C444 parse to the same frames."""
    w, h = 12, 8
    rng = np.random.default_rng(0)
    ys = [rng.integers(16, 236, size=(h, w), dtype=np.uint8)
          for _ in range(3)]
    neutral = lambda ch, cw: np.full((ch, cw), 128, np.uint8)
    p420 = tmp_path / "m420.y4m"
    _write_y4m(p420, [(y, neutral(h // 2, w // 2), neutral(h // 2, w // 2))
                      for y in ys], w, h, "420")
    p444 = tmp_path / "m444.y4m"
    _write_y4m(p444, [(y, neutral(h, w), neutral(h, w)) for y in ys],
               w, h, "444")
    f420 = list(pipeline.y4m_video(str(p420)))
    f444 = list(pipeline.y4m_video(str(p444)))
    assert len(f420) == len(f444) == 3
    for y, a, b in zip(ys, f420, f444):
        assert a.shape == (h, w, 3) and a.dtype == np.uint8
        want = np.clip(np.round(1.164 * (y.astype(np.float32) - 16.0)),
                       0, 255).astype(np.uint8)
        for c in range(3):
            np.testing.assert_array_equal(a[..., c], want)
        np.testing.assert_array_equal(a, b)


def test_y4m_source_chroma_roundtrip(tmp_path):
    """Encode a known BGR frame to C444 YUV with the inverse BT.601
    transform; decoding must recover it within rounding."""
    w, h = 6, 4
    rng = np.random.default_rng(1)
    bgr = rng.integers(30, 220, size=(h, w, 3), dtype=np.uint8)
    b, g, r = (bgr[..., i].astype(np.float64) for i in range(3))
    yp = 16 + (0.257 * r + 0.504 * g + 0.098 * b)
    up = 128 + (-0.148 * r - 0.291 * g + 0.439 * b)
    vp = 128 + (0.439 * r - 0.368 * g - 0.071 * b)
    planes = tuple(np.clip(np.round(t), 0, 255).astype(np.uint8)
                   for t in (yp, up, vp))
    p = tmp_path / "c.y4m"
    _write_y4m(p, [planes], w, h, "444")
    (got,) = list(pipeline.y4m_video(str(p)))
    assert np.max(np.abs(got.astype(int) - bgr.astype(int))) <= 3


def test_native_yuv_decode_parity_when_built(tmp_path, monkeypatch):
    """The threaded C++ YUV→BGR stage agrees with the numpy path on random
    chroma across all three subsamplings (rounding-boundary tolerance 1)."""
    native = _native_or_skip(need_yuv=True)
    rng = np.random.default_rng(7)
    w, h = 16, 12
    for cs, (sy, sx) in (("420", (2, 2)), ("422", (1, 2)), ("444", (1, 1))):
        y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        u = rng.integers(0, 256, size=(h // sy, w // sx), dtype=np.uint8)
        v = rng.integers(0, 256, size=(h // sy, w // sx), dtype=np.uint8)
        p = tmp_path / f"p{cs}.y4m"
        _write_y4m(p, [(y, u, v)], w, h, cs)
        (got_native,) = list(pipeline.y4m_video(str(p)))
        monkeypatch.setattr(pipeline, "_native", None)
        (got_numpy,) = list(pipeline.y4m_video(str(p)))
        monkeypatch.undo()
        assert np.max(np.abs(got_native.astype(int) -
                             got_numpy.astype(int))) <= 1, cs
        # direct call too (threaded)
        direct = native.yuv_to_bgr(y, u, v, sy, sx, n_threads=3)
        np.testing.assert_array_equal(direct, got_native)


def test_y4m_odd_dims_chroma_clamps_like_native(tmp_path, monkeypatch):
    """Odd-dimension subsampled frames: the numpy chroma upsample must
    clamp its index map like the C path (ci = min(i//sx, cw−1)) — the
    old repeat-and-crop came up a column short at odd w (broadcast
    ValueError killed the iterator)."""
    rng = np.random.default_rng(5)
    for cs, (sy, sx), (w, h) in (("422", (1, 2), (7, 5)),
                                 ("420", (2, 2), (9, 7))):
        y = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        u = rng.integers(0, 256, size=(h // sy, w // sx), dtype=np.uint8)
        v = rng.integers(0, 256, size=(h // sy, w // sx), dtype=np.uint8)
        p = tmp_path / f"odd{cs}.y4m"
        _write_y4m(p, [(y, u, v)], w, h, cs)
        monkeypatch.setattr(pipeline, "_native", None)
        (got,) = list(pipeline.y4m_video(str(p)))
        monkeypatch.undo()
        assert got.shape == (h, w, 3), cs
        from spectralae.data import native
        if native.available() and native.has_yuv():
            (got_native,) = list(pipeline.y4m_video(str(p)))
            assert np.max(np.abs(got.astype(int) -
                                 got_native.astype(int))) <= 1, cs


def test_y4m_source_rejects_garbage(tmp_path):
    p = tmp_path / "bad.y4m"
    p.write_bytes(b"MPEG nope\n")
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        next(pipeline.y4m_video(str(p)))


def test_cli_accepts_y4m_source(tmp_path, capsys):
    from spectralae.cli.main import main
    w = h = 16
    rng = np.random.default_rng(2)
    frames = [(rng.integers(16, 236, size=(h, w), dtype=np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8))
              for _ in range(4)]
    p = tmp_path / "v.y4m"
    _write_y4m(p, frames, w, h)
    main(["train", "--nx", "16", "--steps", "2", "--batch", "2",
          "--source", str(p), "--log-every", "1"])
    out = capsys.readouterr().out
    assert '"step": 0' in out and '"loss"' in out


def test_native_yuv_rejects_mismatched_planes():
    from spectralae.data import native
    if not native.has_yuv():
        pytest.skip("native lib not built")
    y = np.zeros((12, 16), np.uint8)
    with pytest.raises(ValueError, match="chroma planes"):
        native.yuv_to_bgr(y, np.zeros((6, 8), np.uint8),
                          np.zeros((6, 8), np.uint8), 1, 1)
    with pytest.raises(ValueError, match="bad subsampling"):
        native.yuv_to_bgr(y, y, y, 3, 1)


def test_rotating_checkpoints_prune_and_resolve(tmp_path):
    cfg, spec, params = setup()
    for step in (10, 20, 30, 40):
        ckpt.save_rotating(tmp_path / "hist", params, spec, step=step,
                           keep=2)
    dirs = sorted(p.name for p in (tmp_path / "hist").iterdir()
                  if p.is_dir())
    assert dirs == ["step_00000030", "step_00000040"]
    assert (tmp_path / "hist" / "LATEST").read_text() == "step_00000040"
    p2, spec2, _, extra = ckpt.load(tmp_path / "hist")
    assert extra["step"] == 40
    np.testing.assert_array_equal(np.asarray(p2.stages[0].c),
                                  np.asarray(params.stages[0].c))


def test_rotating_prune_orders_by_recency_after_rollback(tmp_path):
    """Pruning must drop the OLDEST checkpoints by mtime, not by name: a
    divergence rollback re-saves an earlier step, so by name the fresh
    good checkpoints sort below the NaN-era dirs and name-order pruning
    deleted them while retaining the diverged history forever."""
    import os
    import time as _time
    cfg, spec, params = setup()
    now = _time.time()

    def stamp(step, age_s):
        # explicit mtimes (not sleeps): on coarse-mtime filesystems the
        # save calls would otherwise share one timestamp and the recency
        # order would be arbitrary
        os.utime(tmp_path / "h" / f"step_{step:08d}", (now - age_s,) * 2)

    for i, step in enumerate((100, 101, 102)):   # the NaN-era history
        ckpt.save_rotating(tmp_path / "h", params, spec, step=step, keep=3)
        stamp(step, 50 - i * 10)
    for i, step in enumerate((51, 52)):  # rollback, continued training
        ckpt.save_rotating(tmp_path / "h", params, spec, step=step, keep=3)
        stamp(step, 20 - i * 10)
    dirs = {p.name for p in (tmp_path / "h").iterdir() if p.is_dir()}
    # the three most-recent saves survive; the two stalest NaN-era ones go
    assert dirs == {"step_00000102", "step_00000051", "step_00000052"}
    assert (tmp_path / "h" / "LATEST").read_text() == "step_00000052"


def test_rotating_rollback_save_survives_prune(tmp_path):
    """A divergence rollback re-saves an EARLIER step than the NaN-era
    history; the prune must never delete the directory LATEST points at
    (it sorts below the newer-named dirs)."""
    cfg, spec, params = setup()
    for step in (10, 20):
        ckpt.save_rotating(tmp_path / "h", params, spec, step=step, keep=1)
    ckpt.save_rotating(tmp_path / "h", params, spec, step=0, keep=1)
    assert (tmp_path / "h" / "LATEST").read_text() == "step_00000000"
    assert (tmp_path / "h" / "step_00000000" / "manifest.json").exists()
    _, _, _, extra = ckpt.load(tmp_path / "h")
    assert extra["step"] == 0
    # keep=1: only the rollback target survives
    dirs = [p.name for p in (tmp_path / "h").iterdir() if p.is_dir()]
    assert dirs == ["step_00000000"]


def test_rotating_keep_nonpositive_is_unlimited(tmp_path):
    """keep<=0 means unlimited history — prune nothing (the original
    contract; a keep=0 caller must never lose checkpoints)."""
    cfg, spec, params = setup()
    for step in (1, 2, 3):
        ckpt.save_rotating(tmp_path / "h", params, spec, step=step, keep=0)
    dirs = sorted(p.name for p in (tmp_path / "h").iterdir() if p.is_dir())
    assert dirs == ["step_00000001", "step_00000002", "step_00000003"]


def test_async_save_commits_and_orders(tmp_path):
    cfg, spec, params = setup()
    import jax.numpy as jnp
    from spectralae.core.types import ConvStage
    from spectralae.core.types import AEParams
    p1 = params
    p2 = AEParams(stages=tuple(
        ConvStage(c=s.c + 1.0, b=s.b) for s in params.stages))
    ckpt.save_async(tmp_path / "a", p1, spec, extra={"step": 1})
    ckpt.save_async(tmp_path / "a", p2, spec, extra={"step": 2})
    ckpt.wait_pending_saves()
    loaded, _, _, extra = ckpt.load(tmp_path / "a")
    assert extra["step"] == 2  # last writer wins (ordered worker)
    np.testing.assert_array_equal(np.asarray(loaded.stages[0].c),
                                  np.asarray(p2.stages[0].c))


def test_cli_train_ckpt_history_resume(tmp_path, capsys):
    from spectralae.cli.main import main
    main(["train", "--nx", "16", "--steps", "5", "--batch", "2",
          "--ckpt", str(tmp_path / "h"), "--ckpt-every", "2",
          "--ckpt-history", "2", "--log-every", "1"])
    capsys.readouterr()
    assert (tmp_path / "h" / "LATEST").exists()
    main(["train", "--nx", "16", "--steps", "7", "--batch", "2",
          "--resume", str(tmp_path / "h"), "--log-every", "1"])
    out = capsys.readouterr().out
    assert "resumed from" in out and '"step": 5' in out


def test_cli_train_midrun_ckpt_stamps_step_reached(tmp_path, capsys):
    """Mid-run step-mode checkpoints stamp the step REACHED (step_i+1 —
    the params have already applied step_i's update), matching the final
    save: stamping step_i made a resume from a mid-run checkpoint replay
    one optimizer update."""
    from spectralae.cli.main import main
    main(["train", "--nx", "16", "--steps", "4", "--batch", "2",
          "--ckpt", str(tmp_path / "h"), "--ckpt-every", "2",
          "--ckpt-history", "4", "--log-every", "4"])
    capsys.readouterr()
    dirs = sorted(p.name for p in (tmp_path / "h").iterdir() if p.is_dir())
    # one mid-run save after step_i=2 completed (-> step 3), final at 4
    assert dirs == ["step_00000003", "step_00000004"]


def _encode_png_with_filters(img, filters):
    """Build a PNG whose row r uses filters[r % len] — forward-filters the
    scanlines so read_png must correctly reverse sub/up/avg/paeth."""
    import struct
    import zlib
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros((w * ch,), np.int32)
    flat = img.reshape(h, w * ch).astype(np.int32)
    for r in range(h):
        ft = filters[r % len(filters)]
        row = flat[r]
        enc = np.zeros((w * ch,), np.int32)
        for i in range(w * ch):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if (r and i >= ch) else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b if r else 0
            elif ft == 3:
                pred = (a + (b if r else 0)) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
            enc[i] = (row[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    header = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", header)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_read_png_all_filter_types(tmp_path, monkeypatch):
    """read_png reverses every scanline filter (0-4), via both the C
    unfilter and the pure-Python fallback."""
    from spectralae.viz import png as pngmod
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    p = tmp_path / "f.png"
    p.write_bytes(_encode_png_with_filters(img, [0, 1, 2, 3, 4]))
    got = pngmod.read_png(p)
    np.testing.assert_array_equal(got, img)
    # force the Python fallback
    from spectralae.data import native
    monkeypatch.setattr(native, "has_png_unfilter", lambda: False)
    np.testing.assert_array_equal(pngmod.read_png(p), img)


def test_image_dir_source_and_cli(tmp_path, capsys):
    from spectralae.viz.png import read_png, write_png
    rng = np.random.default_rng(12)
    for i in range(3):
        write_png(tmp_path / f"frame_{i:03d}.png",
                  rng.integers(0, 256, size=(20, 18, 3), dtype=np.uint8))
    frames = list(pipeline.image_dir_frames(str(tmp_path)))
    assert len(frames) == 3
    assert frames[0].shape == (20, 18, 3)
    # default treats files as standard RGB and reverses to the pipeline's
    # BGR convention (ADVICE r2); 'bgr' passes framework dumps through
    np.testing.assert_array_equal(
        frames[1], read_png(tmp_path / "frame_001.png")[:, :, ::-1])
    raw = next(pipeline.image_dir_frames(str(tmp_path),
                                         channel_order="bgr"))
    np.testing.assert_array_equal(raw, read_png(tmp_path / "frame_000.png"))
    from spectralae.cli.main import main
    main(["train", "--nx", "16", "--steps", "2", "--batch", "2",
          "--source", str(tmp_path), "--log-every", "1"])
    out = capsys.readouterr().out
    assert '"step": 1' in out


def test_video_file_source_mp4(tmp_path):
    """OpenCV-demuxed video files feed the pipeline (the container image
    ships cv2 5.x; skip only if it ever disappears)."""
    cv2 = pytest.importorskip("cv2")
    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (32, 24))
    assert w.isOpened()
    for i in range(5):
        w.write(np.full((24, 32, 3), i * 40, np.uint8))
    w.release()
    frames = list(pipeline.video_file_frames(path))
    assert len(frames) == 5
    assert frames[0].shape == (24, 32, 3) and frames[0].dtype == np.uint8
    # MJPG is lossy but flat frames survive within a few counts
    assert abs(int(frames[2].mean()) - 80) <= 4
    # loop=True rewinds
    it = pipeline.video_file_frames(path, loop=True)
    assert len([next(it) for _ in range(12)]) == 12
    with pytest.raises(ValueError, match="cannot open"):
        next(pipeline.video_file_frames(str(tmp_path / "missing.mp4")))


def test_cli_accepts_video_file(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from spectralae.cli.main import main
    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (16, 16))
    for i in range(6):
        w.write(np.full((16, 16, 3), 30 + i, np.uint8))
    w.release()
    main(["train", "--nx", "16", "--steps", "2", "--batch", "2",
          "--source", path, "--log-every", "1"])
    out = capsys.readouterr().out
    assert '"step": 1' in out


def test_prefetcher_propagates_source_errors():
    """A failing source must surface in the consumer, not hang it."""
    def bad_source():
        yield np.zeros((8, 8, 3), np.uint8)
        raise ValueError("stream corrupted mid-read")
    pf = pipeline.DevicePrefetcher(bad_source(), nx=8, ny=8, batch=1)
    assert np.asarray(next(pf)).shape == (1, 3, 8, 8)
    with pytest.raises(ValueError, match="stream corrupted"):
        next(pf)
    pf.close()


def test_prefetcher_yields_trailing_partial_batch():
    src = iter([np.zeros((8, 8, 3), np.uint8)] * 5)
    pf = pipeline.DevicePrefetcher(src, nx=8, ny=8, batch=2)
    shapes = [b.shape[0] for b in pf]
    assert shapes == [2, 2, 1]
    pf.close()


def test_prefetcher_terminal_after_exhaustion_and_error():
    """next() after exhaustion (or after the propagated worker error) must
    raise immediately — the worker's one-shot sentinel is gone, so without
    the terminal flag the call blocked forever on the queue."""
    src = iter([np.zeros((8, 8, 3), np.uint8)])
    pf = pipeline.DevicePrefetcher(src, nx=8, ny=8, batch=1)
    assert next(pf).shape[0] == 1
    for _ in range(3):                      # repeated, instant, no deadlock
        with pytest.raises(StopIteration):
            next(pf)
    pf.close()

    def bad_source():
        raise ValueError("boom")
        yield  # pragma: no cover

    pf2 = pipeline.DevicePrefetcher(bad_source(), nx=8, ny=8, batch=1)
    with pytest.raises(ValueError, match="boom"):
        next(pf2)
    with pytest.raises(StopIteration):      # terminal, not a hang
        next(pf2)
    pf2.close()
