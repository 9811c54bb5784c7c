from yolo_puncture_tpu.tasks.classify import (  # noqa: F401
    load_classify_net,
    predict_images,
    predict_and_find_start_inserted,
    ClassifierNet,
)
from yolo_puncture_tpu.tasks.unet import load_unet, unet_predict, UNetPredictor  # noqa: F401
