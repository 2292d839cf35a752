"""Load reference functions from /root/reference SOURCE TEXT as test
oracles, without importing the reference modules (their imports — somajo,
click, tqdm, qurator.utils — are not installed here, and we must not copy
reference code into this repo).

We parse the module with ``ast``, extract only the named pure function,
and exec it in a minimal namespace. The byte-identity invariant
(BASELINE.json input_hint) is then checked by running the reference's own
``clean_text`` side-by-side with ours.
"""

from __future__ import annotations

import ast
import logging
import re
import types

REFERENCE_ROOT = "/root/reference"


def load_reference_function(rel_path: str, func_name: str, extra_ns=None):
    path = f"{REFERENCE_ROOT}/{rel_path}"
    with open(path, encoding="utf-8") as f:
        source = f.read()
    tree = ast.parse(source)
    func = next(
        node
        for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name == func_name
    )
    module = ast.Module(body=[func], type_ignores=[])
    code = compile(module, filename=path, mode="exec")
    ns: dict = {
        "re": re,
        "logger": logging.getLogger("reference_oracle"),
        "types": types,
    }
    if extra_ns:
        ns.update(extra_ns)
    exec(code, ns)
    return ns[func_name]


def load_reference_functions(rel_path: str, func_names: list[str], extra_ns=None,
                             strip_decorators: bool = False):
    """Like load_reference_function but loads several co-dependent
    functions into one shared namespace (e.g. get_sub_cats → _get_cats).
    ``strip_decorators`` removes decorator expressions (click commands)
    so a CLI entry point's body can run as a plain function oracle."""
    path = f"{REFERENCE_ROOT}/{rel_path}"
    with open(path, encoding="utf-8") as f:
        source = f.read()
    tree = ast.parse(source)
    funcs = [
        node
        for node in tree.body
        if isinstance(node, ast.FunctionDef) and node.name in func_names
    ]
    if strip_decorators:
        for f_node in funcs:
            f_node.decorator_list = []
    module = ast.Module(body=funcs, type_ignores=[])
    code = compile(module, filename=path, mode="exec")
    ns: dict = {
        "re": re,
        "logger": logging.getLogger("reference_oracle"),
        "types": types,
    }
    if extra_ns:
        ns.update(extra_ns)
    exec(code, ns)
    return {name: ns[name] for name in func_names}


def reference_clean_text():
    """The reference's clean_text (qurator/wikipedia/ner.py:30-76),
    exec'd from its own source — THE oracle for E1 byte-identity."""
    return load_reference_function("qurator/wikipedia/ner.py", "clean_text")


def reference_tokenize_links():
    """qurator/wikipedia/ner.py:79-120; needs a pandas-indexed entity
    frame. Returns the raw function; tests build the inputs."""
    return load_reference_function("qurator/wikipedia/ner.py", "tokenize_links")
