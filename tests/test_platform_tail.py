"""utils/__init__ platform tail + loader/source tail (reference
utils/__init__.py:141-1367, data/loaders.py:452-659): container classes,
YAML io, decorators, env detection, in-memory inference sources."""

import threading
import time
from pathlib import Path

import numpy as np
import pytest


def test_yaml_io(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils import yaml_load, yaml_print, yaml_save

    p = tmp_path / "cfg.yaml"
    yaml_save(p, {"a": 1, "path": Path("/x/y"), "nested": {"b": [1, 2]}})
    d = yaml_load(p)
    assert d == {"a": 1, "path": "/x/y", "nested": {"b": [1, 2]}}
    d2 = yaml_load(p, append_filename=True)
    assert d2["yaml_file"] == str(p)
    yaml_print(str(p))  # logs, no raise


def test_container_classes():
    from improving_yolov8_cbam_swinblock_tpu.utils import IterableSimpleNamespace, SimpleClass

    ns = IterableSimpleNamespace(a=1, b="x")
    assert dict(ns) == {"a": 1, "b": "x"}
    assert ns.get("missing", 7) == 7
    assert "a=1" in str(ns)
    assert IterableSimpleNamespace(a=1) == IterableSimpleNamespace(a=1)

    class Thing(SimpleClass):
        """doc"""

        def __init__(self):
            self.x = 5

    t = Thing()
    assert "x: 5" in str(t)
    with pytest.raises(AttributeError):
        t.nope


def test_decorators():
    from improving_yolov8_cbam_swinblock_tpu.utils import Retry, ThreadingLocked, TryExcept, threaded

    @TryExcept("ctx")
    def boom():
        raise ValueError("kaput")

    assert boom() is None  # swallowed + logged

    calls = {"n": 0}

    @Retry(times=3, delay=0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("again")
        return "done"

    assert flaky() == "done" and calls["n"] == 3

    seen = []

    @threaded
    def bg(v):
        seen.append(v)

    th = bg(1)
    th.join(2)
    assert seen == [1]
    assert bg(2, threaded=False) is None and seen == [1, 2]

    order = []
    lock = ThreadingLocked()

    @lock
    def critical(i):
        order.append(("in", i))
        time.sleep(0.01)
        order.append(("out", i))

    ts = [threading.Thread(target=critical, args=(i,)) for i in range(3)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    # serialized: every 'in' immediately followed by its 'out'
    for k in range(0, 6, 2):
        assert order[k][0] == "in" and order[k + 1] == ("out", order[k][1])


def test_strings_and_env():
    from improving_yolov8_cbam_swinblock_tpu.utils import (
        clean_url,
        colorstr,
        deprecation_warn,
        emojis,
        get_default_args,
        get_user_config_dir,
        is_dir_writeable,
        is_github_action_running,
        is_online,
        is_pytest_running,
        remove_colorstr,
        url2file,
    )

    assert clean_url("https://u:p@h/m.ckpt?sig=1") == "https://u:p@h/m.ckpt"
    assert url2file("https://h/a/b/weights.ckpt?x=1") == "weights.ckpt"
    assert remove_colorstr(colorstr("red", "bold", "msg")) == "msg"
    assert isinstance(emojis("hi 🚀"), str)
    assert is_online() is False
    assert is_pytest_running() is True
    assert isinstance(is_github_action_running(), bool)
    assert is_dir_writeable("/tmp") is True
    assert get_user_config_dir().name == "yolo_tpu"
    deprecation_warn("old_key", "new_key")

    def fn(a, b=2, c="x"):
        pass

    assert get_default_args(fn) == {"b": 2, "c": "x"}


def test_plt_settings(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils import plt_settings

    @plt_settings({"font.size": 9}, backend="Agg")
    def draw():
        import matplotlib.pyplot as plt

        assert plt.rcParams["font.size"] == 9
        fig = plt.figure()
        fig.savefig(tmp_path / "f.png")
        return "drawn"

    assert draw() == "drawn"
    assert (tmp_path / "f.png").exists()


def test_memory_sources():
    from PIL import Image

    from improving_yolov8_cbam_swinblock_tpu.data.loaders import (
        LoadPilAndNumpy,
        LoadTensor,
        autocast_list,
    )

    pil = Image.fromarray(np.full((8, 8, 3), 7, np.uint8))
    arrs = autocast_list([pil, np.ones((8, 8, 3), np.uint8)])
    assert all(a.shape == (8, 8, 3) for a in arrs)
    src = LoadPilAndNumpy([pil])
    assert len(src) == 1 and src.bs == 1
    img, tag = next(iter(src))
    assert img.shape == (8, 8, 3) and tag.endswith(".jpg")
    # BCHW float tensor -> HWC uint8 frames
    frames = list(LoadTensor(np.random.rand(2, 3, 8, 8).astype(np.float32)))
    assert len(frames) == 2 and frames[0][0].dtype == np.uint8


def test_cache_alias_roundtrip(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.data.utils import (
        get_hash,
        load_dataset_cache_file,
        save_dataset_cache_file,
    )

    f1 = tmp_path / "a.txt"
    f1.write_text("x")
    h1 = get_hash([str(f1)])
    f1.write_text("longer content")  # size-keyed like the reference get_hash
    assert get_hash([str(f1)]) != h1
    save_dataset_cache_file("test: ", tmp_path / "labels.cache", {"labels": [1, 2]})
    back = load_dataset_cache_file(tmp_path / "labels.cache")
    assert back["labels"] == [1, 2] and "version" in back


def test_check_train_batch_size():
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel
    from improving_yolov8_cbam_swinblock_tpu.utils.model_utils import check_train_batch_size

    m = DetectionModel("yolov8n.yaml", dtype=jnp.bfloat16)
    bs = check_train_batch_size(m, imgsz=64)
    assert isinstance(bs, int) and bs >= 1
