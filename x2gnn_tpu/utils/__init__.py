from x2gnn_tpu.utils.profiling import (  # noqa: F401
    StepTimer, Throughput, trace)
