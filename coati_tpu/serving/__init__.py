"""Production serving (BEYOND-PARITY — the reference has no serving
layer; its notebooks call the model in-process). Micro-batched inference
over the jitted COATI surfaces: requests aggregate into device-efficient
batches (the API's power-of-two bucketing bounds XLA recompiles), ride
one TPU program, and fan back out."""

from coati_tpu.serving.batcher import MicroBatcher
from coati_tpu.serving.continuous import ContinuousDecoder
from coati_tpu.serving.server import CoatiInferenceServer

__all__ = ["ContinuousDecoder", "MicroBatcher", "CoatiInferenceServer"]
