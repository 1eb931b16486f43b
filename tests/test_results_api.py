"""Results container API parity (reference engine/results.py:187-1843):
Boxes track-id column, Masks polygons, Probs, __getitem__/update/new,
verbose/summary/to_df/to_sql, classify predict path, plot rendering."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.engine.results import OBB, Boxes, Keypoints, Masks, Probs, Results


@pytest.fixture()
def img():
    return (np.random.default_rng(0).random((80, 120, 3)) * 255).astype(np.uint8)


def _results(img, n=3):
    rng = np.random.default_rng(1)
    x1 = rng.random((n, 1)) * 40
    y1 = rng.random((n, 1)) * 30
    det = np.concatenate(
        [x1, y1, x1 + 20, y1 + 20, rng.random((n, 1)), rng.integers(0, 3, (n, 1))], axis=1
    ).astype(np.float32)
    return Results(img, "im.jpg", {0: "cat", 1: "dog", 2: "bird"}, det)


def test_boxes_track_id_column(img):
    data = np.array([[1, 2, 30, 40, 7, 0.9, 1]], np.float32)  # 7-col: id at index 4
    b = Boxes(data, img.shape[:2])
    assert b.is_track and b.id is not None and int(b.id[0]) == 7
    assert b.conf[0] == pytest.approx(0.9) and int(b.cls[0]) == 1
    b6 = Boxes(np.array([[1, 2, 30, 40, 0.9, 1]], np.float32), img.shape[:2])
    assert b6.id is None and b6.conf[0] == pytest.approx(0.9)


def test_masks_polygons_and_duck_typing(img):
    m = np.zeros((2, 80, 120), bool)
    m[0, 10:30, 20:50] = True
    m[1, 40:60, 60:100] = True
    masks = Masks(m, img.shape[:2])
    assert masks.shape == (2, 80, 120) and len(masks) == 2
    xy = masks.xy
    assert len(xy) == 2 and xy[0].shape[1] == 2
    assert xy[0][:, 0].min() >= 19 and xy[0][:, 0].max() <= 50
    xyn = masks.xyn
    assert all((p >= 0).all() and (p <= 1).all() for p in xyn if len(p))
    np.testing.assert_array_equal(np.asarray(masks), m)  # __array__
    assert masks[0].shape == (80, 120)  # __getitem__


def test_probs_top1_top5():
    p = Probs(np.array([0.1, 0.5, 0.2, 0.15, 0.03, 0.02], np.float32))
    assert p.top1 == 1 and p.top1conf == pytest.approx(0.5)
    assert p.top5 == [1, 2, 3, 0, 4]
    assert p.top5conf[0] == pytest.approx(0.5)


def test_results_getitem_update_new(img):
    r = _results(img)
    r.masks = Masks(np.zeros((3, 80, 120), bool), img.shape[:2])
    sub = r[:2]
    assert len(sub) == 2 and len(sub.masks) == 2
    one = r[0]
    assert len(one) == 1
    r2 = r.new()
    assert len(r2) == 0 and r2.path == r.path
    r.update(boxes=np.array([[0, 0, 10, 10, 0.5, 2]], np.float32))
    assert len(r) == 1 and int(r.boxes.cls[0]) == 2


def test_verbose_summary_exports(img, tmp_path):
    r = _results(img)
    v = r.verbose()
    assert "cat" in v or "dog" in v or "bird" in v
    rows = r.summary()
    assert len(rows) == 3 and {"name", "class", "confidence", "box"} <= set(rows[0])
    df = r.to_df()
    assert len(df) == 3
    assert "confidence" in r.to_csv()
    db = r.to_sql(db_path=str(tmp_path / "r.db"))
    import sqlite3

    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM results").fetchone()[0] == 3
    con.close()
    # classify summary
    rc = Results(img, "im.jpg", {0: "cat", 1: "dog"})
    rc.probs = Probs(np.array([0.3, 0.7], np.float32))
    assert rc.summary()[0]["name"] == "dog"
    assert "dog" in rc.verbose()


def test_plot_variants(img):
    r = _results(img)
    r.masks = Masks(np.ones((3, 40, 60), bool), img.shape[:2])  # model-res masks get resized
    r.keypoints = Keypoints(np.tile([10.0, 10.0, 0.9], (3, 4, 1)), img.shape[:2])
    out = r.plot()
    assert out.shape == img.shape and out.dtype == img.dtype
    rc = Results(img, "im.jpg", {0: "cat"})
    rc.probs = Probs(np.array([1.0], np.float32))
    assert rc.plot().shape == img.shape
    # track-id labels render
    rt = Results(img, "im.jpg", {0: "cat"}, np.zeros((0, 6), np.float32))
    rt.boxes = Boxes(np.array([[5, 5, 40, 40, 3, 0.8, 0]], np.float32), img.shape[:2])
    assert rt.plot().shape == img.shape


def test_obb_indexing(img):
    ob = np.array([[30, 30, 20, 10, 0.3, 0.9, 1], [60, 40, 16, 8, -0.2, 0.8, 0]], np.float32)
    r = Results(img, "im.jpg", {0: "a", 1: "b"}, np.zeros((2, 6), np.float32))
    r.obb = OBB(ob, img.shape[:2])
    sub = r[0]
    assert len(sub.obb.data) == 1


def test_classify_predict_e2e(img):
    from improving_yolov8_cbam_swinblock_tpu import YOLO

    m = YOLO("yolov8n-cls.yaml")
    res = m.predict(img, imgsz=64)
    r = res[0]
    assert r.probs is not None and len(r.probs) == len(m.names) if isinstance(m.names, dict) else True
    assert 0 <= r.probs.top1 < len(r.probs)
    assert np.asarray(r.probs).sum() == pytest.approx(1.0, abs=1e-3)  # softmax
    assert r.plot().shape == img.shape
    assert r.summary()[0]["class"] == r.probs.top1


def test_annotator_surface(img):
    """Reference Annotator API (plotting.py:158-530): masks/kpts/text/
    rectangle/circle_label/text_label/save_one_box."""
    from improving_yolov8_cbam_swinblock_tpu.utils.plotting import Annotator, colors, save_one_box

    assert colors(0) != colors(1) and len(colors(2, bgr=True)) == 3
    a = Annotator(img.copy(), names={0: "cat"})
    a.box_label([5, 5, 60, 50], "cat 0.9", color=colors(0, bgr=True))
    a.box_label([10, 10, 30, 30, 40, 10, 20, 40], "obb", rotated=True)
    m = np.zeros((1, 40, 60), bool)
    m[0, 5:20, 5:30] = True
    a.masks(m, [colors(1, bgr=True)])
    kpts = np.concatenate([np.random.default_rng(2).random((17, 2)) * 60, np.ones((17, 1))], axis=1)
    a.kpts(kpts)
    a.rectangle([2, 2, 20, 20], outline=(255, 0, 0))
    a.text([4, 4], "hello", box_style=True)
    a.circle_label([5, 5, 60, 50], "3")
    a.text_label([5, 5, 60, 50], "zone")
    w, h, area = a.get_bbox_dimension([0, 0, 10, 20])
    assert (w, h, area) == (10, 20, 200)
    out = a.result()
    assert out.shape == img.shape and not np.array_equal(out, img)
    assert a.im is a.img
    crop = save_one_box([10, 10, 40, 40], img, save=False, square=True)
    assert crop.shape[0] == crop.shape[1]


def test_device_chainers_and_html(img):
    """cpu()/numpy()/to() are identity chainers (arrays are host numpy;
    reference results.py:373-442); to_html/tojson mirror to_df/to_json."""
    r = _results(img)
    assert r.cpu() is r and r.numpy() is r and r.to("cpu") is r
    assert r.tojson() == r.to_json()
    html = r.to_html()
    assert "<table" in html and "</table>" in html


def test_obb_track_id_column(img):
    """OBB accepts (n,8) rows with a track id before conf
    (reference results.py:1655-1766)."""
    row7 = np.array([[40.0, 30.0, 20.0, 10.0, 0.3, 0.9, 2.0]])
    o7 = OBB(row7, img.shape[:2])
    assert o7.id is None and o7.conf[0] == pytest.approx(0.9) and o7.cls[0] == 2
    row8 = np.insert(row7, 5, 7.0, axis=1)  # id=7
    o8 = OBB(row8, img.shape[:2])
    assert o8.is_track and o8.id[0] == 7 and o8.conf[0] == pytest.approx(0.9) and o8.cls[0] == 2
    assert np.allclose(o8.xywhr, row7[:, :5])
