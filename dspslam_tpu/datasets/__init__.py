from . import kitti, mono
