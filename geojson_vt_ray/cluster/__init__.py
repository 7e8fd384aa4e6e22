from .index import ClusterIndex

__all__ = ["ClusterIndex"]
