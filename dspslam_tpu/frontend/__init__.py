from . import matcher, orb, stereo
