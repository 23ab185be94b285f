from semiuhpe_tpu.detect.model import YOLOv5P6, yolov5_bpjdet  # noqa: F401
