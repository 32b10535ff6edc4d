"""S3Gen: speech tokens -> 24 kHz waveform, as XLA-compiled stages.

Pipeline (reference `models/s3gen/s3gen.py:233-323`):
  tokens --embed--> UpsampleConformerEncoder (2x) --proj--> mu [80, T_mel]
  mu + prompt mel + x-vector --CFM Euler (CFG batch-2)--> mel
  mel --F0 predictor--> sine source --NSF + iSTFT--> waveform
"""
