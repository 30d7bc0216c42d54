"""Duck-typed unpickler for the reference's canned OCR response pickles.

The reference's mock fixtures (tests/_mock_data/azure.pkl, surya.pkl,
tests/ocr/doctr/test_data/ocr.pkl) pickle SDK response objects whose
packages (azure-cognitiveservices, surya, doctr) are not installed here.
The converters under test only read plain attributes off those objects,
so this loader substitutes a generated attribute-bag class for any class
whose module cannot be imported, while resolving importable modules
(numpy, builtins) normally.  Covers the pickling shapes those fixtures
use: NEWOBJ/REDUCE construction, dict and (dict, slots) BUILD states, and
pydantic-v2's ``{'__dict__': ...}`` setstate wrapper.
"""

from __future__ import annotations

import importlib
import io
import pickle


class DuckObject:
    _duck_name = "DuckObject"

    def __new__(cls, *args, **kwargs):
        obj = object.__new__(cls)
        if args:
            obj._duck_args = args
        if kwargs:
            obj.__dict__.update(kwargs)
        return obj

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        if isinstance(state, tuple) and len(state) == 2:
            d, slots = state
            state = {**(d or {}), **(slots or {})}
        if isinstance(state, dict):
            inner = state.get("__dict__")
            if isinstance(inner, dict):  # pydantic v2 state wrapper
                self.__dict__.update(inner)
                for k, v in state.items():
                    if k != "__dict__" and isinstance(v, dict):
                        self.__dict__.update(v)
            else:
                self.__dict__.update(state)

    def __repr__(self):
        return f"<{self._duck_name} {list(self.__dict__)[:6]}>"


class _DuckUnpickler(pickle.Unpickler):
    def __init__(self, f):
        super().__init__(f)
        self._classes: dict[tuple[str, str], type] = {}

    def find_class(self, module, name):
        try:
            mod = importlib.import_module(module)
            return getattr(mod, name)
        except Exception:
            key = (module, name)
            if key not in self._classes:
                self._classes[key] = type(
                    name, (DuckObject,), {"_duck_name": f"{module}.{name}"})
            return self._classes[key]


def duck_load(path: str):
    with open(path, "rb") as f:
        return _DuckUnpickler(f).load()


def duck_loads(data: bytes):
    return _DuckUnpickler(io.BytesIO(data)).load()
