from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .loop import (  # noqa: F401
    FitResult,
    TrainState,
    create_train_state,
    fit_node_classifier,
    make_eval_fn,
    make_node_classification_step,
)
from .metrics import (  # noqa: F401
    Accumulator,
    accuracy,
    binary_accuracy,
    masked_sigmoid_bce,
    masked_softmax_cross_entropy,
    precision_recall_fbeta,
)
from .han_batch import fit_han_minibatch  # noqa: F401
from .schedule import warmup_poly_schedule  # noqa: F401
from .scan_loop import (  # noqa: F401
    fit_node_classifier_scan,
    make_scanned_node_classification_run,
)
