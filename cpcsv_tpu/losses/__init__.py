from cpcsv_tpu.losses.gan_losses import (
    bce_with_logits,
    multilabel_soft_margin,
    kl_loss,
    discriminator_loss,
    generator_loss,
    multi_label_accuracy,
)
from cpcsv_tpu.losses.shuffle import create_random_shuffle, check_is_order

__all__ = [
    "bce_with_logits",
    "multilabel_soft_margin",
    "kl_loss",
    "discriminator_loss",
    "generator_loss",
    "multi_label_accuracy",
    "create_random_shuffle",
    "check_is_order",
]
