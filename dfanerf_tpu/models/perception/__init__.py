"""Perception models (inference-only, pretrained-weight consumers):
face parsing (BiSeNet), face detection (BlazeFace), landmark regression
(HRNet + GhostNet eyes), dense flow (RAFT-small). All are functional JAX
reimplementations with converters from the reference PyTorch checkpoints."""
