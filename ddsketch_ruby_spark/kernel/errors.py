"""Error types (reference lib/ddsketch/errors.rb:4-9)."""


class SketchError(Exception):
    """Base error for the sketch kernel."""


class InvalidSketchMergeError(SketchError):
    """Raised when merging sketches with different gamma
    (reference lib/ddsketch/base_sketch.rb:146-149,181-183)."""
