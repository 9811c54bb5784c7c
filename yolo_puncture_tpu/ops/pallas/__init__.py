from yolo_puncture_tpu.ops.pallas.proto_decode import proto_decode_pallas  # noqa: F401
from yolo_puncture_tpu.ops.pallas.mem_attention import memory_readout_pallas  # noqa: F401
