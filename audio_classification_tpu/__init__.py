"""audio_classification_tpu — TPU-native target-speaker transcription framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the
NatsuiroGinga/audio-classification reference pipeline (see SURVEY.md):
offline + streaming target-speaker transcription of multi-talker audio via
overlapped-speech detection -> 2/3-source separation -> speaker-verification
gating -> ASR, plus speaker-ID benchmarking and SI-SDR/PIT separation
evaluation.

Unlike the CPU-ONNX/torch reference, every compute stage here is a batched,
bucketed XLA program on TPU: fused STFT/fbank frontend, Conv-TasNet /
MossFormer separation, speaker embedding, CTC greedy decode, PIT SI-SDR and
cosine SV gating all run on device with no per-segment host round trips.

Layering (bottom-up):
  runtime/    device + mesh management, seeding, resource monitoring
  audio_io/   WAV codec (native C++ + numpy fallback), capture drivers
  ops/        signal kernels: frames, STFT, mel-fbank, resample (Pallas + XLA)
  models/     JAX modules: OSD segmenter, ConvTasNet, MossFormer, speaker
              embedder, SenseVoice-style CTC ASR, VAD; weight converters
  parallel/   mesh axes, shardings, collectives
  engine/     segment algebra, length bucketing, batched stage dispatch
  metrics/    SI-SDR/PIT, CER/WER, OSD P/R/F1/IoU, RTF accounting
  pipelines/  offline_overlap3 (flagship), overlap_mvp, sid_benchmark,
              evaluate_with_sources, streaming
  train/      PIT SI-SDR training, pjit-sharded train step, orbax ckpts
  cli/        flag-compatible runners + artifact writers
"""

__version__ = "0.1.0"

G_SAMPLE_RATE = 16000
