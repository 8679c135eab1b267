"""Offline tooling: video/SVO IO, frame extraction, FID/LPIPS CLIs
(capability parity with reference src/misc/)."""
