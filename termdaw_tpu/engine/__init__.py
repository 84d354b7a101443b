"""Engine: session state, refresh (Lua -> compiled graph), render, playback."""
