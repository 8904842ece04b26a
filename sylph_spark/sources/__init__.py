from .images import IMAGES_SCHEMA, read_images, validate_images_schema  # noqa: F401
