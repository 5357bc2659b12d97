from .availablenow import stream_tiles_available_now  # noqa: F401
