"""Deep-zoom tile pyramids and tile export (reference:
tiatoolbox/tools/pyramid.py and WSIReader.save_tiles).

``TilePyramidGenerator`` serves deep-zoom levels on demand (the tile
server uses the Zoomify variant); ``dump`` writes the whole pyramid to
a directory, tar, or zip.
"""

from pathlib import Path

from tiatoolbox_tpu.data.synth import make_synthetic_slide
from tiatoolbox_tpu.tools.pyramid import TilePyramidGenerator, ZoomifyGenerator
from tiatoolbox_tpu.wsicore.wsireader import WSIReader

slide_path = "/tmp/example_slide.tiff"
make_synthetic_slide(slide_path, size=(2048, 1536), mpp=0.5, objective_power=20)
wsi = WSIReader.open(slide_path)

gen = TilePyramidGenerator(wsi, tile_size=256)
print("deep-zoom levels:", gen.level_count)
tile = gen.get_tile(level=gen.level_count - 1, x=0, y=0)
print("full-res tile:", tile.size)

# Zoomify layout (TileGroup dirs) — what the viewer fetches.
zoom = ZoomifyGenerator(wsi, tile_size=256)
print("zoomify tile path:", zoom.tile_path(level=2, x=1, y=0))

out_dir = Path("/tmp/example_pyramid")
gen.dump(out_dir)
print("dumped tiles:", sum(1 for _ in out_dir.rglob("*.jpg")))

# Plain grid export at a fixed resolution (CLI: save-tiles).
wsi.save_tiles("/tmp/example_tiles", tile_objective_value=10,
               tile_read_size=(512, 512))
print("saved grid tiles:", len(list(Path("/tmp/example_tiles").rglob("*.jpg"))))
