from . import deepsdf
