"""Pure-Python stand-in for the `jiter` compiled extension (the
reference venv ships a macOS cp39 binary this container cannot load).
The openai SDK imports `from_json` at module import; the non-streaming
chat-completions path never calls it, so a json.loads wrapper keeps the
REAL SDK importable without touching its behavior under test."""

import json


def from_json(data, /, **kwargs):
    return json.loads(data)
