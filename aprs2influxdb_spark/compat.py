"""Environment-compatibility probes, import-time safe (no Spark deps).

``ensure_protobuf`` runs at package import — BEFORE any SparkSession /
JVM exists — because its whole point is to export env vars the forked
Python workers must inherit from the JVM process environment.
"""

from __future__ import annotations

import importlib
import os
import sys

# Well-known locations of a pure-Python ``google.protobuf`` runtime on
# hosts with no pip-installed copy.  The Google Cloud SDK ships the
# BSD-licensed upstream runtime inside its App Engine platform tree; an
# explicit ``SPARK_GRAFT_PROTOBUF_PATH`` override is probed first.
_PROTOBUF_FALLBACK_PATHS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable, probing fallback runtimes.

    Returns True if the runtime is (now) importable.  When a fallback
    path is used, it is ALSO exported on ``PYTHONPATH`` together with
    protobuf's official ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK``
    flag, so the Python workers forked by the JVM inherit both — the
    ``transformWithState`` state-server protocol (``StateMessage_pb2``)
    is imported worker-side, and a bundled runtime may trail pyspark's
    gencode by a minor version (the wire format is stable across
    minors).  Must run before the SparkSession/JVM starts for worker
    env inheritance — hence the package-``__init__`` call site.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        pass
    override = os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")
    candidates = ((override,) if override else ()) + _PROTOBUF_FALLBACK_PATHS
    for path in candidates:
        if not path or not os.path.isdir(os.path.join(path, "google", "protobuf")):
            continue
        added = path not in sys.path
        if added:
            sys.path.append(path)
        # Make the retry re-resolve `google.protobuf` WITHOUT breaking
        # an already-imported `google.*` sibling (google.auth,
        # google.cloud, ...): popping the parent would orphan their
        # attributes on the fresh namespace.  A PEP-420 namespace
        # parent recomputes __path__ from sys.path dynamically, so it
        # needs no pop; a legacy (static-__path__) parent gets the
        # fallback's google/ dir appended instead.  Only a childless
        # parent (the failed-import placeholder case) is dropped.
        g = sys.modules.get("google")
        has_children = any(m.startswith("google.") for m in sys.modules)
        if g is not None and not has_children:
            sys.modules.pop("google", None)
        elif g is not None and getattr(g, "__file__", None) is not None:
            gdir = os.path.join(path, "google")
            if gdir not in getattr(g, "__path__", []):
                g.__path__.append(gdir)
        sys.modules.pop("google.protobuf", None)
        try:
            importlib.import_module("google.protobuf.descriptor")
        except Exception:
            if added:  # never strip a path the user put there themselves
                sys.path.remove(path)
            continue
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        py_path = os.environ.get("PYTHONPATH", "")
        if path not in py_path.split(os.pathsep):
            os.environ["PYTHONPATH"] = (py_path + os.pathsep + path) if py_path else path
        return True
    return False


_PROTOBUF_AVAILABLE = ensure_protobuf()
