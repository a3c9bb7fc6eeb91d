"""Core tensor ops: resize/pyramid, cascade forward, NMS, similarity transform."""
