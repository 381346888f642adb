from openasr_tpu.utils.timer import Timer  # noqa: F401
from openasr_tpu.utils.metrics import edit_distance, batch_distance  # noqa: F401
