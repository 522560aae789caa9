from multitalent_tpu.models.generic_unet import GenericUNet, build_unet_from_plans  # noqa: F401
