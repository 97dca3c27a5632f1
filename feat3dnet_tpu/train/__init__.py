"""Training: alignment triplet loss, optax train step, two-stage recipe.

Reference: Feat3dNet.get_loss/get_train_op (/root/reference/models/
feat3dnet.py:315-375), the train.py driver loop, and the train.sh two-stage
protocol.
"""
from feat3dnet_tpu.train.loss import alignment_triplet_loss
from feat3dnet_tpu.train.trainer import TrainState, Trainer, make_train_step

__all__ = ["alignment_triplet_loss", "TrainState", "Trainer", "make_train_step"]
