"""Nucleus instance segmentation with HoVerNet + watershed
(reference: nucleus-instance-segmentation notebook)."""

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.models.architecture import get_pretrained_model
from tiatoolbox_tpu.models.engine.multi_task_segmentor import MultiTaskSegmentor

slide_path = "/tmp/example_mts_slide.tiff"
make_synthetic_slide(slide_path, size=(512, 384), mpp=0.25, objective_power=40)

# offline: random-init weights with a warning; with network access the
# registry downloads the real PanNuke checkpoint
model, ioconfig = get_pretrained_model("hovernet_fast-pannuke")
seg = MultiTaskSegmentor(model, batch_size=8, num_loader_workers=0)
out = seg.run([slide_path], patch_mode=False, ioconfig=ioconfig,
              auto_get_mask=False, verbose=False)
result = next(iter(out.values()))
print("instances:", len(result["instances"]))
for uid, inst in list(result["instances"].items())[:3]:
    print(uid, "centroid:", inst["centroid"], "type:", inst.get("type"))
