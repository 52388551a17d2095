"""Runtime: simulator backends, in-process message bus, episode orchestration."""
