"""Reference model-zoo module paths (yolo_seg/tasks/models/)."""
