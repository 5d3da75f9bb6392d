"""Multichannel fluorescence slides: channel colors, compositing, viewer.

OME-TIFF/QPTIFF channel color tables parse into ``MultichannelToRGB``,
which the reader applies automatically so a 5-channel fluorescence
slide reads as an RGB composite (reference:
tiatoolbox/utils/postproc_defs.py:11-138 and the Bokeh channel UI,
bokeh_app/main.py:169-320). The viewer drives the same machinery over
``/tileserver/channels`` + ``/tileserver/enhance``.
"""

import numpy as np

from tiatoolbox_tpu.utils.postproc_defs import MultichannelToRGB
from tiatoolbox_tpu.wsicore.tiffio import TiffPyramidWriter
from tiatoolbox_tpu.wsicore.wsireader import WSIReader

# -- build a synthetic 5-channel OME fluorescence slide ----------------
chan = "".join(
    f'<Channel ID="Channel:{i}" Name="{name}" Color="{color}"/>'
    for i, (name, color) in enumerate(
        [
            ("DAPI", 0x0000FF),
            ("FITC", 0x00FF00),
            ("TRITC", 0xFF0000),
            ("Cy5", 0xFF00FF),
            ("AF750", 0xFFFF00),
        ]
    )
)
ome = (
    '<OME xmlns="http://www.openmicroscopy.org/Schemas/OME/2016-06">'
    f"<Image><Pixels>{chan}</Pixels></Image></OME>"
)
rng = np.random.default_rng(0)
img = rng.integers(0, 160, (512, 512, 5)).astype(np.uint8)
path = "/tmp/example_fluor.ome.tiff"
# deflate: JPEG tiles are 1/3-channel only
TiffPyramidWriter(
    path, tile_size=256, description=ome, compression="deflate"
).write([img])

# -- read: channel color table applies automatically -------------------
wsi = WSIReader.open(path)
print("channels:", list(wsi.post_proc.color_dict))  # parsed from OME-XML
rgb = wsi.read_rect((0, 0), (256, 256))  # RGB composite
print("composite:", rgb.shape, rgb.dtype)

# raw channels: open without the post-processor
raw_reader = WSIReader.open(path, post_proc=None)
raw = raw_reader.read_rect((0, 0), (256, 256))
print("raw:", raw.shape)

# -- recolor / select channels on the host ------------------------------
to_rgb = MultichannelToRGB(
    color_dict={
        "DAPI": (0, 0, 1),
        "FITC": (0, 1, 0),
        "TRITC": (1, 0, 0),
        "Cy5": (1, 0, 1),
        "AF750": (1, 1, 0),
    },
)
to_rgb.set_active_channels([0, 1, 2])  # composite only the first three
composite = to_rgb(raw)
print("custom composite:", composite.shape)
to_rgb.enhance = 2.0  # gain, same as the viewer's enhance slider
print("enhanced max:", int(to_rgb(raw).max()))

# -- in the viewer ------------------------------------------------------
# python -m tiatoolbox_tpu.cli show-wsi --img-input /tmp/example_fluor.ome.tiff
# The sidebar lists channels with toggles + color pickers and an
# enhance slider (endpoints: PUT /tileserver/channels, /tileserver/enhance).
