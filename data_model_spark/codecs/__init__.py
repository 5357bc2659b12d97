from .registry import decode_image, encode_image, psnr_db  # noqa: F401
