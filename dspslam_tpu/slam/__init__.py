from . import pose_opt
