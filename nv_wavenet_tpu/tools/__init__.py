"""User-facing CLI entry points (installed as console scripts, see
pyproject.toml): perf harness, batch inference, mel featurization, and
checkpoint evaluation.  The repo-root `tools/` directory keeps thin shims
for the documented `python tools/<name>.py` invocations plus the
development/verification harnesses that are not part of the installed
surface (verify_drive, equivalence_tpu, baseline_sweep, ...)."""
