"""asy_vrnet_tpu: TPU-native vision+radar panoptic perception framework."""

__version__ = "0.1.0"
