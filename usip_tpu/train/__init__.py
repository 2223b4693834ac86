from usip_tpu.train.checkpoint import (
    load_params_only,
    restore_checkpoint,
    save_checkpoint,
    save_params_only,
)
from usip_tpu.train.state import (
    TrainState,
    lr_at_epoch,
    make_adam,
    set_learning_rate,
)
from usip_tpu.train.steps import (
    DescriptorBatch,
    DetectorBatch,
    PackedParentBatch,
    ParentBatch,
    QuantParentBatch,
    quantize_parent,
    make_descriptor_train_step,
    make_detector_eval_step,
    make_detector_infer,
    make_detector_train_step,
)

__all__ = [
    "TrainState",
    "lr_at_epoch",
    "make_adam",
    "set_learning_rate",
    "DescriptorBatch",
    "DetectorBatch",
    "PackedParentBatch",
    "ParentBatch",
    "QuantParentBatch",
    "quantize_parent",
    "make_descriptor_train_step",
    "make_detector_eval_step",
    "make_detector_infer",
    "make_detector_train_step",
    "save_checkpoint",
    "restore_checkpoint",
    "save_params_only",
    "load_params_only",
]
