from . import gba, loop_closing  # noqa: F401
