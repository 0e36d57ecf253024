"""Rich collection summaries: terminal tables + notebook HTML.

The Spark re-expression of the reference's display surface
(`src/rasteret/core/display.py`: DescribeResult renders ``describe()`` as a
plain-text table in REPLs and styled HTML in notebooks, with the raw dict
reachable via ``.data``/``[key]``).  Two deliberate differences:

- ``DescribeResult`` here is a real ``Mapping``: ``dict(d)``, ``**d`` and
  ``d.keys()`` work, so programmatic consumers (the CLI's ``collections
  info``, tests) treat it exactly like the plain dict it replaces.
- The numbers behind it come from ONE Spark aggregation pass (see
  ``Collection.describe``) rather than one job per property — on a
  100 TB catalog, four full scans for a repr is the difference between a
  summary and an outage.

No external dependencies, no IPython imports: notebooks pick up
``_repr_html_``/``_repr_mimebundle_`` through the display protocol.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping
from typing import Any

_ACCENT = "#2563eb"  # neutral blue accent for the HTML table
_MUTED = "#64748b"


def _esc(s: str) -> str:
    return str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _fmt_bounds(bounds) -> str:
    if bounds is None:
        return "-"
    return "({:.4f}, {:.4f}, {:.4f}, {:.4f})".format(*bounds)


def _fmt_epsg(epsg: list[int]) -> str:
    if not epsg:
        return "-"
    shown = ", ".join(f"EPSG:{e}" for e in epsg[:3])
    extra = len(epsg) - 3
    return shown if extra <= 0 else f"{shown} (+{extra} more)"


class DescribeResult(Mapping):
    """Mapping over the summary dict that also renders itself.

    Terminal/REPL: aligned plain-text table (``__repr__``).  Jupyter /
    marimo / Colab: styled HTML (``_repr_html_`` + ``_repr_mimebundle_``).
    """

    def __init__(self, data: dict[str, Any], title: str = "Collection"):
        self._data = dict(data)
        self._title = title

    # --- Mapping protocol (dict-compatible: **d, dict(d), d[k], k in d) ------
    def __getitem__(self, key: str) -> Any:
        return self._data[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    @property
    def data(self) -> dict[str, Any]:
        return dict(self._data)

    # --- rendering -----------------------------------------------------------
    def _rows(self) -> list[tuple[str, str]]:
        rows: list[tuple[str, str]] = []
        for key, val in self._data.items():
            if key == "bounds":
                shown = _fmt_bounds(val)
            elif key == "epsg":
                shown = _fmt_epsg(val)
            elif key == "dates" and val:
                shown = f"{val[0]} .. {val[1]}"
            elif val is None:
                shown = "-"
            else:
                shown = str(val)
            rows.append((key, shown))
        return rows

    def __repr__(self) -> str:
        rows = self._rows()
        if not rows:
            return f"{self._title}: (empty)"
        kw = max(8, max(len(k) for k, _ in rows))
        vw = max(len(v) for _, v in rows)
        lines = [self._title, "", f"  {'Property':<{kw}}  Value",
                 f"  {'-' * kw}  {'-' * vw}"]
        lines += [f"  {k:<{kw}}  {v}" for k, v in rows]
        lines.append("")
        return "\n".join(lines)

    def __str__(self) -> str:
        return self.__repr__()

    def _repr_html_(self) -> str:
        body = "".join(
            "<tr>"
            f"<td style='padding:3px 14px 3px 0;font-weight:600;"
            f"white-space:nowrap'>{_esc(k)}</td>"
            f"<td style='padding:3px 0;font-family:monospace'>{_esc(v)}</td>"
            "</tr>"
            for k, v in self._rows()
        )
        return (
            "<div style='font-family:system-ui,sans-serif;font-size:13px;"
            "max-width:560px'>"
            f"<div style='font-weight:700;font-size:14px;color:{_ACCENT};"
            f"margin-bottom:6px'>{_esc(self._title)}</div>"
            "<table style='border-collapse:collapse;width:100%'>"
            "<thead><tr>"
            f"<th style='text-align:left;padding:3px 14px 3px 0;"
            f"border-bottom:2px solid {_ACCENT};font-size:12px;"
            f"color:{_MUTED}'>Property</th>"
            f"<th style='text-align:left;padding:3px 0;border-bottom:"
            f"2px solid {_ACCENT};font-size:12px;color:{_MUTED}'>Value</th>"
            "</tr></thead>"
            f"<tbody>{body}</tbody></table></div>"
        )

    def _repr_mimebundle_(self, *, include=None, exclude=None, **kwargs):
        return {"text/plain": self.__repr__(), "text/html": self._repr_html_()}
