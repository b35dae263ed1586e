from . import kitti, mono


def get_sequence(data_dir: str, system_cfg):
    """Sequence factory (reference reconstruct/__init__.py:16-23):
    KITTI -> stereo+LiDAR sequence; Redwood/Freiburg -> mono sequence."""
    if system_cfg.data_type == "KITTI":
        return kitti.KITTISequence(data_dir, system_cfg.detection)
    return mono.MonoSequence(data_dir, system_cfg.detection, system_cfg.camera.K)
