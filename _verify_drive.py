import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from improving_yolov8_cbam_swinblock_tpu import YOLO

img = (np.random.rand(240, 320, 3) * 255).astype(np.uint8)

# seg predict -> Masks container surface
m = YOLO("yolov8n-seg.yaml")
r = m.predict(img, imgsz=160, conf=0.001)[0]
print("seg boxes:", len(r.boxes), "masks:", None if r.masks is None else r.masks.shape)
if r.masks is not None and len(r.masks):
    print("xy polys:", [p.shape for p in r.masks.xy][:3])
print("verbose:", r.verbose()[:80])
_ = r.plot(); _ = r.summary(); _ = r[0] if len(r) else None
print("json ok:", len(r.to_json()) > 0)

# classify predict on real chip
c = YOLO("yolov8n-cls.yaml")
rc = c.predict(img, imgsz=64)[0]
print("classify top1:", rc.probs.top1, "plot:", rc.plot().shape)

# detect + to_sql/to_df
d = YOLO("yolov8n.yaml")
rd = d.predict(img, imgsz=160, conf=0.001)[0]
print("detect:", len(rd.boxes), "df rows:", len(rd.to_df()))
import tempfile, os
p = rd.to_sql(db_path=os.path.join(tempfile.mkdtemp(), "r.db"))
print("sql ok:", os.path.exists(p))
