from nbodyax.io.checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
