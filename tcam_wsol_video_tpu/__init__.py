"""tcam-wsol-video-tpu: TPU-native weakly-supervised video object
localization (the capabilities of sbelharbi/tcam-wsol-video rebuilt on
JAX/XLA/Pallas).

Public surface mirrors the reference's package factory
(/root/reference/dlib/__init__.py:36-75):

    from tcam_wsol_video_tpu import create_model, constants
"""
from tcam_wsol_video_tpu.core import constants  # noqa: F401
from tcam_wsol_video_tpu.models.factory import (  # noqa: F401
    create_model, create_model_from_args, get_encoder, init_model)

__version__ = "0.1.0"
