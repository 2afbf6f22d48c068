"""Host-side audio I/O: WAV codec, streaming ring buffer, capture drivers."""
from .wav import read_wav, to_mono, write_wav
from .stream_buffer import RingBuffer

__all__ = ["read_wav", "write_wav", "to_mono", "RingBuffer"]
