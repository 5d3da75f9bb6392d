"""Device-plane (JAX/XLA/Pallas) compute ops.

The hot per-tile math lives here: color conversion, stain transforms,
histograms/Otsu, resize, and canvas stitching. Host-plane tools in
``tiatoolbox_tpu.tools`` dispatch into these for batched work.
"""
