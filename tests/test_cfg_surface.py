"""Config-surface parity: packaged dataset descriptors, tracker cfg
YAMLs, solutions defaults, run-dir incrementing, the native TorchVision
block, and the GCP region tool (reference cfg/datasets/*,
cfg/trackers/*, cfg/solutions/default.yaml, utils/files.py:107,
nn/modules/block.py:1601 TorchVision, hub/google)."""

import numpy as np
import pytest

from improving_yolov8_cbam_swinblock_tpu.cfg import CFG_DIR


# ---------------------------------------------------------------- datasets
def test_dataset_yaml_registry_shipped():
    names = {p.name for p in (CFG_DIR / "datasets").glob("*.yaml")}
    # the descriptor set users address by bare name (reference cfg/datasets)
    for expect in ("coco.yaml", "coco8.yaml", "coco128.yaml", "coco8-seg.yaml",
                   "coco8-pose.yaml", "dota8.yaml", "VOC.yaml", "ImageNet.yaml"):
        assert expect in names
    assert len(names) >= 30


def test_check_det_dataset_resolves_bare_name():
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import check_det_dataset

    d = check_det_dataset("coco8.yaml")
    assert d["nc"] == 80
    assert d["names"][0] == "person" and d["names"][79] == "toothbrush"
    # split paths resolved relative to the descriptor's `path:`
    assert d["train"].endswith("coco8/images/train")


def test_check_det_dataset_pose_metadata():
    from improving_yolov8_cbam_swinblock_tpu.data.dataset import check_det_dataset

    d = check_det_dataset("coco8-pose.yaml")
    assert list(d["kpt_shape"]) == [17, 3]
    assert len(d["flip_idx"]) == 17


# ---------------------------------------------------------------- trackers
def test_build_tracker_from_packaged_yaml():
    from improving_yolov8_cbam_swinblock_tpu.trackers import build_tracker

    trk = build_tracker("bytetrack")
    assert type(trk).__name__ == "BYTETracker"
    assert trk.track_high_thresh == 0.25 and trk.match_thresh == 0.8

    bot = build_tracker("botsort.yaml")
    assert type(bot).__name__ == "BOTSORT"
    assert bot.gmc.method == "sparseOptFlow" and bot.with_reid is False


def test_build_tracker_user_overrides(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.trackers import build_tracker

    f = tmp_path / "custom.yaml"
    f.write_text(
        "tracker_type: botsort\ntrack_high_thresh: 0.6\ntrack_buffer: 60\n"
        "match_thresh: 0.7\ngmc_method: none\nfuse_score: False\n"
    )
    trk = build_tracker(str(f), frame_rate=30)
    assert trk.track_high_thresh == 0.6
    assert trk.max_time_lost == 60
    assert trk.fuse_score_flag is False
    assert trk.gmc.method == "none"


def test_build_tracker_unknown_type_raises(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.trackers import build_tracker

    f = tmp_path / "bad.yaml"
    f.write_text("tracker_type: sort\n")
    with pytest.raises(ValueError):
        build_tracker(str(f))


# ---------------------------------------------------------------- solutions
def test_solution_defaults_yaml_merge():
    from improving_yolov8_cbam_swinblock_tpu.solutions import SOLUTION_DEFAULTS
    from improving_yolov8_cbam_swinblock_tpu.solutions.solutions import AIGym

    assert SOLUTION_DEFAULTS["conf"] == 0.25
    gym = AIGym(model=None)
    # kpts/up_angle default from cfg/solutions/default.yaml
    assert list(gym.kpts) == [6, 8, 10]
    assert gym.up_angle == 145.0


# ---------------------------------------------------------------- files
def test_increment_path(tmp_path):
    from improving_yolov8_cbam_swinblock_tpu.utils.files import increment_path

    d = tmp_path / "exp"
    assert increment_path(d) == d  # doesn't exist yet -> unchanged
    d.mkdir()
    assert increment_path(d) == tmp_path / "exp2"
    assert increment_path(d, exist_ok=True) == d
    (tmp_path / "exp2").mkdir()
    assert increment_path(d) == tmp_path / "exp3"
    f = tmp_path / "r.txt"
    f.write_text("x")
    assert increment_path(f).name == "r2.txt"


def test_get_save_dir_task_aware(tmp_path):
    from types import SimpleNamespace

    from improving_yolov8_cbam_swinblock_tpu.utils.files import get_save_dir

    args = SimpleNamespace(project=None, name=None, task="segment", exist_ok=False, resume=False)
    assert str(get_save_dir(args, mode="train")) == "runs/segment/train"
    args2 = SimpleNamespace(project=str(tmp_path), name="train", exist_ok=False, resume=False)
    (tmp_path / "train").mkdir()
    assert get_save_dir(args2).name == "train2"
    args2.resume = True
    assert get_save_dir(args2).name == "train"


# ---------------------------------------------------------------- TorchVision
def test_torchvision_resnet18_trunk_params():
    import jax
    import jax.numpy as jnp

    from improving_yolov8_cbam_swinblock_tpu.nn.modules_tv import TorchVision

    m = TorchVision(512, model="resnet18")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    # torchvision resnet18 total 11,689,512 minus fc (513,000) = trunk
    assert n == 11_176_512
    y = m.apply(v, jnp.zeros((1, 64, 64, 3)), False)
    assert y.shape == (1, 2, 2, 512)


def test_yolo11_cls_resnet18_builds():
    from improving_yolov8_cbam_swinblock_tpu.nn.tasks import DetectionModel

    m = DetectionModel("yolo11-cls-resnet18.yaml", nc=10)
    assert m.task == "classify"
    v = m.shape_init(imgsz=64)
    # resnet18 trunk (11,176,512) + Classify head on 512ch
    assert m.param_count(v) > 11_176_512


# ---------------------------------------------------------------- hub/google
def test_gcp_regions_lowest_latency_fake_probe():
    from improving_yolov8_cbam_swinblock_tpu.hub.google import GCPRegions

    fake = {"us-central1": 5.0, "europe-west4": 11.0}
    regions = GCPRegions(probe=lambda r: fake.get(r, float("inf")))
    assert "us-central1" in regions.tier1() and "us-west2" in regions.tier2()
    rows = regions.lowest_latency(top=2, tier=1, attempts=2)
    assert rows[0][0] == "us-central1" and rows[0][1] == 5.0
    assert rows[1][0] == "europe-west4"
