from . import cells, crs, geometry, gridlib  # noqa: F401
