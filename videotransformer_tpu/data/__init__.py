"""Data subsystem: video decode, Kinetics dataset, clip-consistent transforms,
device-side fused augmentation, cube masking, mixup, HOG targets."""
