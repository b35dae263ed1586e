from . import detections
