from .preprocess import (
    ImageNetEvalPipeline,
    ImageNetTrainPipeline,
    VideoDownscaler,
    imagenet_eval_preprocess,
)
from .pyramid import aa_pyramid
from .train import Trainer, init_params, forward, loss_fn, make_train_step
from .batch import resize_mixed_batch, ShapeBucketResizer
from .flax_module import AAResize

__all__ = [
    "ImageNetEvalPipeline",
    "ImageNetTrainPipeline",
    "VideoDownscaler",
    "imagenet_eval_preprocess",
    "aa_pyramid",
    "Trainer",
    "init_params",
    "forward",
    "loss_fn",
    "make_train_step",
    "resize_mixed_batch",
    "ShapeBucketResizer",
    "AAResize",
]
