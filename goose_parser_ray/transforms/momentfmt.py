"""moment.js format-token engine for the ``date`` transform (SURVEY.md §2.2 T3).

goose-parser's ``date`` transform parses with a moment.js format string
(``from``) and re-formats with another (``to``), locale-aware month names
(upstream depends on moment.js — SURVEY.md §2.2). No OS-locale dependence is
allowed (SURVEY.md §7.6-2), so month/weekday names are bundled tables and both
parsing and formatting are implemented directly on the token stream —
no strptime platform quirks.

Token subset (the README/tests-era moment tokens): YYYY YY MMMM MMM MM M
DD D Do dddd ddd HH H hh h mm m ss s A a, plus ``[literal]`` escapes.
Unrecognized characters pass through as literals (moment behavior — the
``T``/``Z`` in ISO format strings).
"""

from __future__ import annotations

import datetime as _dt
import re

MONTHS: dict[str, list[str]] = {
    "en": [
        "January", "February", "March", "April", "May", "June", "July",
        "August", "September", "October", "November", "December",
    ],
    "ru": [
        "января", "февраля", "марта", "апреля", "мая", "июня", "июля",
        "августа", "сентября", "октября", "ноября", "декабря",
    ],
    "de": [
        "Januar", "Februar", "März", "April", "Mai", "Juni", "Juli",
        "August", "September", "Oktober", "November", "Dezember",
    ],
    "fr": [
        "janvier", "février", "mars", "avril", "mai", "juin", "juillet",
        "août", "septembre", "octobre", "novembre", "décembre",
    ],
    "es": [
        "enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
        "agosto", "septiembre", "octubre", "noviembre", "diciembre",
    ],
}

MONTHS_ABBR: dict[str, list[str]] = {
    loc: [m[:3] for m in names] for loc, names in MONTHS.items()
}
MONTHS_ABBR["en"] = [
    "Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec",
]
# moment's French abbreviations — a naive [:3] truncation collides on
# juin/juillet ("jui")
MONTHS_ABBR["fr"] = [
    "janv", "févr", "mars", "avr", "mai", "juin",
    "juil", "août", "sept", "oct", "nov", "déc",
]

WEEKDAYS: dict[str, list[str]] = {  # Monday-first, datetime.weekday() order
    "en": [
        "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
        "Saturday", "Sunday",
    ],
    "ru": [
        "понедельник", "вторник", "среда", "четверг", "пятница",
        "суббота", "воскресенье",
    ],
    "de": [
        "Montag", "Dienstag", "Mittwoch", "Donnerstag", "Freitag",
        "Samstag", "Sonntag",
    ],
    "fr": [
        "lundi", "mardi", "mercredi", "jeudi", "vendredi",
        "samedi", "dimanche",
    ],
    "es": [
        "lunes", "martes", "miércoles", "jueves", "viernes",
        "sábado", "domingo",
    ],
}


class MomentFormatError(ValueError):
    pass


_TOKENS = [
    "YYYY", "YY", "MMMM", "MMM", "MM", "M", "Do", "DD", "D",
    "dddd", "ddd", "HH", "H", "hh", "h", "mm", "m", "ss", "s", "A", "a",
]
_TOKEN_RE = re.compile(
    r"\[(?P<lit>[^\]]*)\]|(?P<tok>" + "|".join(_TOKENS) + r")|(?P<other>.)"
)


def _tokenize(fmt: str) -> list[tuple[str, str]]:
    """-> list of ('tok', token) | ('lit', text)."""
    out: list[tuple[str, str]] = []
    for m in _TOKEN_RE.finditer(fmt):
        if m.group("lit") is not None:
            out.append(("lit", m.group("lit")))
        elif m.group("tok") is not None:
            out.append(("tok", m.group("tok")))
        else:
            # moment passes unrecognized characters through as literals
            # (e.g. the 'T' and 'Z' in ISO format strings)
            out.append(("lit", m.group("other")))
    return out


def _alt(names: list[str]) -> str:
    return "|".join(re.escape(n) for n in sorted(names, key=len, reverse=True))


class MomentParser:
    """Compiled ``from``-format: regex + field extractors (built once at plan
    compile time — SURVEY.md §2.2 chain fusion note)."""

    def __init__(self, fmt: str, locale: str = "en") -> None:
        if locale not in MONTHS:
            raise MomentFormatError(
                f"unsupported locale {locale!r}; bundled: {sorted(MONTHS)}"
            )
        self.fmt, self.locale = fmt, locale
        months, abbrs = MONTHS[locale], MONTHS_ABBR[locale]
        self._month_idx = {n.lower(): i + 1 for i, n in enumerate(months)}
        self._abbr_idx = {n.lower(): i + 1 for i, n in enumerate(abbrs)}
        parts: list[str] = []
        self._fields: list[str] = []

        def grp(field: str, pat: str) -> str:
            self._fields.append(field)
            return f"(?P<f{len(self._fields) - 1}>{pat})"

        for kind, val in _tokenize(fmt):
            if kind == "lit":
                parts.append(re.escape(val))
                continue
            t = val
            if t == "YYYY":
                parts.append(grp("Y4", r"\d{4}"))
            elif t == "YY":
                parts.append(grp("Y2", r"\d{2}"))
            elif t == "MMMM":
                parts.append(grp("Mname", _alt(months)))
            elif t == "MMM":
                parts.append(grp("Mabbr", _alt(abbrs) + r"\.?"))
            elif t in ("MM", "M"):
                parts.append(grp("Mnum", r"\d{1,2}"))
            elif t in ("DD", "D"):
                parts.append(grp("D", r"\d{1,2}"))
            elif t == "Do":
                parts.append(grp("D", r"\d{1,2}") + r"(?:st|nd|rd|th)")
            elif t in ("dddd", "ddd"):  # weekday: match, ignore
                parts.append(r"[^\W\d_]+")
            elif t in ("HH", "H"):
                parts.append(grp("H24", r"\d{1,2}"))
            elif t in ("hh", "h"):
                parts.append(grp("H12", r"\d{1,2}"))
            elif t in ("mm", "m"):
                parts.append(grp("Min", r"\d{1,2}"))
            elif t in ("ss", "s"):
                parts.append(grp("S", r"\d{1,2}"))
            elif t in ("A", "a"):
                parts.append(grp("AmPm", r"[AaPp][Mm]"))
            else:  # pragma: no cover
                raise MomentFormatError(f"unhandled token {t!r}")
        self._re = re.compile(r"^\s*" + "".join(parts) + r"\s*$", re.IGNORECASE)

    def parse(self, value: str) -> _dt.datetime | None:
        m = self._re.match(value)
        if m is None:
            return None
        year, month, day, hour, minute, sec = 1970, 1, 1, 0, 0, 0
        h12: int | None = None
        pm = False
        for i, field in enumerate(self._fields):
            raw = m.group(f"f{i}")
            if field == "Y4":
                year = int(raw)
            elif field == "Y2":
                y = int(raw)
                year = 2000 + y if y < 69 else 1900 + y
            elif field == "Mname":
                month = self._month_idx[raw.lower()]
            elif field == "Mabbr":
                month = self._abbr_idx[raw.lower().rstrip(".")]
            elif field == "Mnum":
                month = int(raw)
            elif field == "D":
                day = int(raw)
            elif field == "H24":
                hour = int(raw)
            elif field == "H12":
                h12 = int(raw)
            elif field == "Min":
                minute = int(raw)
            elif field == "S":
                sec = int(raw)
            elif field == "AmPm":
                pm = raw.lower().startswith("p")
        if h12 is not None:
            hour = (h12 % 12) + (12 if pm else 0)
        try:
            return _dt.datetime(year, month, day, hour, minute, sec)
        except ValueError:
            return None


class MomentFormatter:
    """Compiled ``to``-format."""

    def __init__(self, fmt: str, locale: str = "en") -> None:
        if locale not in MONTHS:
            raise MomentFormatError(
                f"unsupported locale {locale!r}; bundled: {sorted(MONTHS)}"
            )
        self.fmt, self.locale = fmt, locale
        self._tokens = _tokenize(fmt)

    def format(self, dt: _dt.datetime) -> str:
        months, abbrs = MONTHS[self.locale], MONTHS_ABBR[self.locale]
        days = WEEKDAYS[self.locale]
        out: list[str] = []
        for kind, val in self._tokens:
            if kind == "lit":
                out.append(val)
                continue
            t = val
            if t == "YYYY":
                out.append(f"{dt.year:04d}")
            elif t == "YY":
                out.append(f"{dt.year % 100:02d}")
            elif t == "MMMM":
                out.append(months[dt.month - 1])
            elif t == "MMM":
                out.append(abbrs[dt.month - 1])
            elif t == "MM":
                out.append(f"{dt.month:02d}")
            elif t == "M":
                out.append(str(dt.month))
            elif t == "DD":
                out.append(f"{dt.day:02d}")
            elif t == "D":
                out.append(str(dt.day))
            elif t == "Do":
                d = dt.day
                sfx = (
                    "th"
                    if 11 <= d % 100 <= 13
                    else {1: "st", 2: "nd", 3: "rd"}.get(d % 10, "th")
                )
                out.append(f"{d}{sfx}")
            elif t == "dddd":
                out.append(days[dt.weekday()])
            elif t == "ddd":
                out.append(days[dt.weekday()][:3])
            elif t == "HH":
                out.append(f"{dt.hour:02d}")
            elif t == "H":
                out.append(str(dt.hour))
            elif t == "hh":
                out.append(f"{(dt.hour % 12) or 12:02d}")
            elif t == "h":
                out.append(str((dt.hour % 12) or 12))
            elif t == "mm":
                out.append(f"{dt.minute:02d}")
            elif t == "m":
                out.append(str(dt.minute))
            elif t == "ss":
                out.append(f"{dt.second:02d}")
            elif t == "s":
                out.append(str(dt.second))
            elif t == "A":
                out.append("AM" if dt.hour < 12 else "PM")
            elif t == "a":
                out.append("am" if dt.hour < 12 else "pm")
            else:  # pragma: no cover
                raise MomentFormatError(f"unhandled token {t!r}")
        return "".join(out)
