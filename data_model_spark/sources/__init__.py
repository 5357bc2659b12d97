from .images import (  # noqa: F401
    IMAGE_SCHEMA,
    footprint_utm,
    generate_images_df,
    generate_images_pandas,
    image_seed,
    phash64,
    synth_pixels,
)
from .tables import load_table, load_tables  # noqa: F401
