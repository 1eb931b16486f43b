"""Predictor breadth: batched dispatch, stream sources, TTA,
save/save_txt/save_crop (VERDICT round-1 'Next round' #8)."""

from pathlib import Path

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def imgs(tmp_path_factory):
    root = tmp_path_factory.mktemp("predsrc")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(5):
        img = rng.integers(0, 255, (100 + 10 * i, 140, 3), dtype=np.uint8)
        p = root / f"im{i}.jpg"
        cv2.imwrite(str(p), img)
        paths.append(p)
    return root, paths


def test_batched_predict_matches_single(imgs):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    root, paths = imgs
    m = YOLO("yolov8n.yaml")
    single = [m.predict(str(p), imgsz=96, conf=1e-6, batch=1)[0] for p in paths]
    batched = m.predict(str(root), imgsz=96, conf=1e-6, batch=4)  # 4 + remainder 1
    assert len(batched) == len(single) == 5
    for a, b in zip(single, batched):
        assert len(a.boxes) == len(b.boxes)
        if len(a.boxes):
            np.testing.assert_allclose(a.boxes.data, b.boxes.data, rtol=1e-4, atol=1e-3)


def test_stream_video(imgs, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    rng = np.random.default_rng(1)
    vid = tmp_path / "clip.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 64))
    assert w.isOpened(), "mp4v codec unavailable"
    for _ in range(6):
        w.write(rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
    w.release()

    m = YOLO("yolov8n.yaml")
    got = list(m.predict(str(vid), stream=True, imgsz=64, conf=1e-6))
    assert len(got) == 6
    assert all(r.speed["inference"] is not None for r in got)


def test_tta_augmented_predict(imgs):
    """augment=True: 3-scale + flip TTA produces more candidate anchors
    and still yields valid detections."""
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolov8n.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    x = jnp.asarray(np.random.default_rng(0).random((1, 96, 96, 3)), jnp.float32)
    plain, _ = m.apply(v, x, train=False)
    tta = m.predict_augment(v, x)
    assert tta.shape[1] == plain.shape[1]  # same channel layout
    assert tta.shape[2] > plain.shape[2]  # merged multi-scale anchors
    assert bool(jnp.isfinite(tta).all())

    from improving_yolov8_cbam_swinblock_tpu import YOLO

    y = YOLO("yolov8n.yaml")
    root, paths = imgs
    res = y.predict(str(paths[0]), imgsz=96, conf=1e-6, augment=True)
    assert len(res) == 1


def test_save_txt_and_crop(imgs, tmp_path):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    root, paths = imgs
    m = YOLO("yolov8n.yaml")
    out = tmp_path / "run"
    res = m.predict(
        str(paths[0]), imgsz=96, conf=1e-6, save=True, save_txt=True, save_conf=True,
        save_crop=True, project=str(tmp_path), name="run",
    )
    stem = Path(str(paths[0])).stem
    assert (out / f"{stem}.jpg").exists()
    txt = out / "labels" / f"{stem}.txt"
    assert txt.exists()
    if len(res[0].boxes):
        lines = txt.read_text().strip().splitlines()
        assert len(lines) == len(res[0].boxes)
        vals = lines[0].split()
        assert len(vals) == 6  # cls + xywhn + conf
        x, y, w, h = map(float, vals[1:5])
        assert 0 <= x <= 1 and 0 <= y <= 1
        crops = list((out / "crops").rglob("*.jpg"))
        assert len(crops) >= 1


def test_facade_callbacks_load_reset(imgs, tmp_path):
    """Facade callback bus + load/reset_weights (reference Model.add_callback
    engine/model.py:952, Model.load :357, Model.reset_weights :331)."""
    import jax

    from improving_yolov8_cbam_swinblock_tpu import YOLO

    root, paths = imgs
    m = YOLO("yolov8n.yaml")
    seen = []
    m.add_callback("on_predict_start", lambda p: seen.append("start"))
    m.add_callback("on_predict_end", lambda p: seen.append("end"))
    with pytest.raises(ValueError):
        m.add_callback("not_an_event", lambda p: None)
    m.predict(str(paths[0]), imgsz=64)
    assert seen == ["start", "end"]
    m.clear_callback("on_predict_start")
    m.predict(str(paths[0]), imgsz=64)
    assert seen == ["start", "end", "end"]

    # load(): overlay saved weights onto a fresh instance of the same graph
    leaf = lambda v: np.asarray(  # noqa: E731
        jax.tree.leaves(v["params"])[0]
    )
    ck = m.save(str(tmp_path / "w.ckpt"))
    fresh = YOLO("yolov8n.yaml")
    fresh._ensure_variables(64)
    before = leaf(fresh.variables).copy()
    fresh.load(ck)
    assert np.allclose(leaf(fresh.variables), leaf(m.variables))
    # reset_weights(): lazy re-init discards the loaded weights
    fresh.reset_weights()
    assert fresh.variables is None
    fresh._ensure_variables(64)
    assert fresh.variables is not None
    assert isinstance(m.device, str)
    del before


def test_visualize_feature_maps(imgs, tmp_path):
    """visualize=True writes per-layer activation grids per image
    (reference BasePredictor visualize -> feature_visualization)."""
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    root, paths = imgs
    m = YOLO("yolov8n.yaml")
    m.predict(str(paths[0]), imgsz=64, visualize=True, project=str(tmp_path), name="viz")
    d = tmp_path / "viz" / paths[0].stem
    pngs = sorted(d.glob("stage*_features.png"))
    assert len(pngs) > 10, f"expected per-layer grids, got {pngs}"
    # first conv stage present, Detect head (non rank-4) absent
    assert any(p.name.startswith("stage0_Conv") for p in pngs)
    assert not any("Detect" in p.name for p in pngs)
