from .trackml import PointCloudBuilder, build_point_cloud, load_trackml_event

__all__ = ["PointCloudBuilder", "build_point_cloud", "load_trackml_event"]
