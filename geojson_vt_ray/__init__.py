"""geojson_vt_ray — a Ray-Data-native vector-tile slicer + spatial-join engine.

From-scratch reimplementation of the capabilities of maplibre/geojson-vt
(reference at /root/reference, v6.1.1) as Ray Data pipelines: map_batches over
Arrow geometry batches, per-zoom quadtree-split flat-maps, salted
groupby-on-(z,x,y) tile assembly, plus spatial joins (cell index, PIP, kNN),
image-table plumbing, and large-scale training-data operators (dedup, ANN,
text analysis).
"""

from .options import ClusterOptions, TilerOptions

__all__ = ["TilerOptions", "ClusterOptions"]
__version__ = "0.1.0"
