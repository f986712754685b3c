"""Export sinks — COCO JSON (S10) and YOLO txt-per-image (S11)."""
