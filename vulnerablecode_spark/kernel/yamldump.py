"""Deterministic YAML rendering for the FederatedCode export layout.

Matches the style the reference's exporter produces via saneyaml
(pipes/export.py write_file + the expected files under
tests/test_data/exporters/federate_vulnerabilities): two-space indent,
block lists indented under their key with ``- `` items, empty
collections inline as ``[]``/``{}``, ``None`` and empty strings rendered
as a bare ``key:``, and number-looking or YAML-keyword strings
single-quoted so they round-trip as strings. Independent minimal
implementation — this engine ships no YAML dependency.
"""

from __future__ import annotations

_YAML_KEYWORDS = {"true", "false", "yes", "no", "on", "off", "null", "none",
                  "~", ""}


def _is_number_like(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _scalar(value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (int, float)):
        return str(value)
    s = str(value)
    if s == "":
        return ""
    if (s.lower() in _YAML_KEYWORDS or _is_number_like(s)
            or s != s.strip()
            or s.startswith(("- ", "? ", "! ", "& ", "* ", "[", "]", "{",
                             "}", "#", "|", ">", "@", "`", '"', "'", "%"))
            or ": " in s or s.endswith(":") or " #" in s or "\n" in s):
        return "'" + s.replace("'", "''") + "'"
    return s


def _dump(value, indent: int, lines: list) -> None:
    pad = "  " * indent
    if isinstance(value, dict):
        for k, v in value.items():
            if isinstance(v, dict):
                if not v:
                    lines.append(f"{pad}{k}: {{}}")
                else:
                    lines.append(f"{pad}{k}:")
                    _dump(v, indent + 1, lines)
            elif isinstance(v, (list, tuple)):
                if not v:
                    lines.append(f"{pad}{k}: []")
                else:
                    lines.append(f"{pad}{k}:")
                    _dump(list(v), indent + 1, lines)
            else:
                s = _scalar(v)
                lines.append(f"{pad}{k}: {s}" if s else f"{pad}{k}:")
    elif isinstance(value, list):
        for item in value:
            if isinstance(item, dict) and item:
                first = True
                for k, v in item.items():
                    head = f"{pad}- " if first else f"{pad}  "
                    first = False
                    if isinstance(v, dict):
                        if not v:
                            lines.append(f"{head}{k}: {{}}")
                        else:
                            lines.append(f"{head}{k}:")
                            _dump(v, indent + 2, lines)
                    elif isinstance(v, (list, tuple)):
                        if not v:
                            lines.append(f"{head}{k}: []")
                        else:
                            lines.append(f"{head}{k}:")
                            _dump(list(v), indent + 2, lines)
                    else:
                        s = _scalar(v)
                        lines.append(f"{head}{k}: {s}" if s
                                     else f"{head}{k}:")
            else:
                lines.append(f"{pad}- {_scalar(item)}")
    else:
        lines.append(f"{pad}{_scalar(value)}")


def dump_yaml(data) -> str:
    """Render ``data`` (dicts/lists/scalars) as saneyaml-style YAML with
    a trailing newline."""
    lines: list = []
    _dump(data, 0, lines)
    return "\n".join(lines) + "\n"
