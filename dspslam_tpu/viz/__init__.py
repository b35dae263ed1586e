from . import frame_drawer, renderer
