"""Entry-point applications — the L6 layer of the reference rebuilt as
headless tools (SURVEY §1): offline file denoiser (app.py's intended
pipeline), wire-compatible socket daemon (server.py), batched multi-stream
engine daemon (the production serving mode the reference lacks), mic
loopback diagnostic (rtmds.py), and a training CLI (the missing
main.ipynb's reconstructed loop)."""
