from .registry import (  # noqa: F401
    decode_image,
    encode_image,
    encode_image_with_decoded,
    psnr_db,
)
