"""Reference ``yolo_seg.stats`` package path."""
