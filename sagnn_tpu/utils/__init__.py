from sagnn_tpu.utils.logger import log, marktime, spent_time
from sagnn_tpu.utils.profiling import StepTimer, EdgeRateCounter
