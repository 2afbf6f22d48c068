"""asr subpackage."""
