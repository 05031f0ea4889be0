from .mapstate import KeyFrames, MapPoints, MapState  # noqa: F401
