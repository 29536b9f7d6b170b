"""Differential fuzz of the timestamp normalizer against the ACTUAL engine
the reference delegates to: java.time, via tools/TsOracle.java (a faithful
transliteration of timestamp_normalizer.rb's parseBest + resolver with the
spec's fixed Clock).

Contract asserted per generated (locale, default_tz, dtz, value) case:
  * java accepts -> we must accept with the SAME instant (nanosecond-exact);
  * java rejects -> we either reject too, or accept under a DOCUMENTED
    leniency (case-insensitive months, COMPAT-provider month aliases, `zzz`
    short names in the dtz slot are NOT lenient — only the month classes are).
A "we reject what java accepts" or an instant mismatch is a hard failure.

Run: python tools/fuzz_timestamps.py [n_cases]
"""
from __future__ import annotations

import random
import subprocess
import sys

import pandas as pd

ROOT = __file__.rsplit("/", 2)[0]
sys.path.insert(0, ROOT)

from cefspark.timestamps import InvalidTimestamp, TimestampNormalizer  # noqa: E402

NOW = "2026-08-16T00:00:00Z"

MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep", "Oct",
          "Nov", "Dec", "jan", "MAR", "Mär", "März", "janv.", "kesäk.", "Foo",
          # round-3 locale forms: exercised against java under EVERY locale in
          # the pool (accepted only where that locale's tables say so)
          "сент.", "9月", "5월", "márc.", "Μαΐ", "груд.", "ožu", "jūn.",
          "märts", "VII", "Rgp", "十一月"]
ZONES = ["", "UTC", "Z", "GMT", "+05:30", "-08:00", "+0530", "+5", "-18:00",
         "America/New_York", "Europe/Moscow", "Asia/Tokyo", "PST", "PDT",
         "EST", "CET", "EET", "BST", "AEST", "GMT+05:30", "UTC+3", "+300",
         "+25", "Mars/Olympus", "+05:30:30", "GMT+5", "+5:30", "UT-02:00"]
DTZS = ["", "America/New_York", "Europe/Paris", "Asia/Kolkata", "CET", "EET",
        "EST", "PST", "+02:00", "+0530", "+5", "GMT-07:00", "nonsense/zone"]
LOCALES = ["", "en", "de", "fr", "fi", "tr",
           # round-3 locale-table additions (java-dumped); every locale whose
           # month forms appear in MONTHS must be listed here, or those forms
           # only ever exercise the both-reject branch
           "ru", "ja", "el", "hu", "uk", "hr", "lv", "et", "bg", "sk",
           "ko", "lt", "zh", "ro", "sl", "id"]


VALID_MONTHS = MONTHS[:12]


from functools import lru_cache


@lru_cache(maxsize=1)
def _full_locale_pool() -> list[tuple[str, list[str]]]:
    """(tag, month table) for EVERY parseable locale the sandbox JDK exposes
    (the round-4 full dump — 978 tags, space-named locales pre-excluded)."""
    from cefspark import locale_months as lm

    return sorted((t, lm.TABLES[i]) for t, i in lm.TAG_TO_TABLE.items())


def gen_full_locale_case(rng: random.Random) -> tuple[str, str, str, str]:
    """A case drawn from the full JDK locale sweep: the tag's own CLDR month
    forms most of the time (exercising accept-parity for all 209 distinct
    tables), a random other locale's form otherwise (reject-parity)."""
    pool = _full_locale_pool()
    tag, table = pool[rng.randrange(len(pool))]
    if rng.random() < 0.75:
        mon = rng.choice(table)
    else:
        mon = rng.choice(pool[rng.randrange(len(pool))][1])
    day = f"{rng.randint(1, 28):02d}"
    year = f" {rng.randint(1980, 2030)}" if rng.random() < 0.7 else ""
    value = (f"{mon} {day}{year} {rng.randint(0, 23):02d}:"
             f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}")
    zone = rng.choice(ZONES)
    if zone:
        value += f" {zone}"
    return tag, rng.choice(["", "America/New_York", "CET"]), \
        rng.choice(DTZS), value


def gen_case(rng: random.Random) -> tuple[str, str, str, str]:
    if rng.random() < 0.45:  # round-4: sweep the full JDK locale surface
        return gen_full_locale_case(rng)
    mon = rng.choice(VALID_MONTHS) if rng.random() < 0.8 else rng.choice(MONTHS)
    day = (f"{rng.randint(1, 28):02d}" if rng.random() < 0.7 else
           rng.choice([f"{rng.randint(29, 31):02d}", str(rng.randint(1, 9)), "00"]))
    # years >= 1980: the JDK's bundled tzdb and python's tzdata disagree on
    # the INVENTED pre-1977 history of legacy alias zones (java EET@1975 is
    # +03:00, tzdata says +02:00) — a data-version artifact on dates no CEF
    # producer emits, not an engine divergence
    year = f" {rng.randint(1980, 2030)}" if rng.random() < 0.7 else ""
    h = rng.randint(0, 23) if rng.random() < 0.9 else 24
    mi = rng.randint(0, 59) if rng.random() < 0.9 else 60
    s = rng.randint(0, 59) if rng.random() < 0.9 else 60
    frac = rng.choice(["", "", f".{rng.randint(0, 999):03d}",
                       f".{rng.randint(0, 999999):06d}",
                       f".{rng.randint(0, 10**9 - 1):09d}"])
    zone = rng.choice(ZONES)
    value = f"{mon} {day}{year} {h:02d}:{mi:02d}:{s:02d}{frac}"
    if zone:
        value += f" {zone}"
    # bias the locale toward en when the month form is English so more cases
    # reach the instant-equality comparison instead of both-reject
    locale = "" if rng.random() < 0.5 else rng.choice(LOCALES)
    return locale, rng.choice(["", "America/New_York", "CET"]), \
        rng.choice(DTZS), value


def ours(locale: str, tz: str, dtz: str, value: str) -> str:
    try:
        n = TimestampNormalizer(locale=locale or None, timezone=tz or None, now=NOW)
        t = n.normalize(value, dtz or None)
        ns = t.microsecond * 1000 + t.nanosecond
        return f"{(t.value - ns) // 1_000_000_000}.{ns:09d}"
    except InvalidTimestamp as e:
        return f"REJECT ({type(e).__name__})"
    except Exception as e:  # noqa: BLE001 — anything else is a batch-killer
        # ONLY InvalidTimestamp is a legitimate per-row failure; any other
        # exception would kill a whole Arrow batch in the decode UDF and must
        # surface as a hard failure, never as a REJECT
        return f"CRASH ({type(e).__name__}: {e})"


def _primary_table(locale: str) -> dict:
    """CLDR PRIMARY forms for the locale (no aliases), mirroring
    cefspark.timestamps._month_table's resolution order: exact qualified tag
    -> hand-verified language table -> JDK language table -> en."""
    from cefspark.timestamps import _MONTHS, _jdk_tag_tables

    tag = (locale or "en").replace("_", "-").lower()
    lang = tag.split("-")[0]
    jdk = _jdk_tag_tables()
    if lang != tag and tag in jdk:
        return {m: i + 1 for i, m in enumerate(jdk[tag])}
    if lang in _MONTHS:
        return _MONTHS[lang]
    if tag in jdk:
        return {m: i + 1 for i, m in enumerate(jdk[tag])}
    if lang in jdk:
        return {m: i + 1 for i, m in enumerate(jdk[lang])}
    return _MONTHS["en"]


def is_month_leniency_candidate(locale: str, value: str) -> bool:
    """The month token is NOT an exact CLDR primary form for the locale, so
    our acceptance came via a COMPAT alias or the case-insensitive fallback
    (the documented leniency class). Candidates still get a second java pass
    with the month canonicalized — a co-occurring non-month divergence must
    not hide behind the month."""
    return value.split(" ", 1)[0] not in _primary_table(locale)


def canonicalize_month(locale: str, value: str) -> str | None:
    """Rewrite the month token to the locale's CLDR primary form (via the
    SAME resolution helper the parser uses), so java can parse the rest."""
    from cefspark.timestamps import _month_table, resolve_month

    mon, rest = value.split(" ", 1)
    idx = resolve_month(_month_table(locale or None), mon)
    if idx is None:
        return None
    primary = [m for m, i in _primary_table(locale).items() if i == idx][0]
    return f"{primary} {rest}"


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    rng = random.Random(20260816)
    cases = [gen_case(rng) for _ in range(n)]

    def run_java(batch: list[tuple[str, str, str, str]]) -> list[str]:
        proc = subprocess.run(
            ["java", "-cp", "/tmp/tsoracle", "TsOracle"],
            input="\n".join("\t".join(c) for c in batch) + "\n",
            capture_output=True, text=True, timeout=600)
        out = proc.stdout.splitlines()
        assert len(out) == len(batch), (len(out), proc.stderr[-500:])
        return out

    java_out = run_java(cases)

    # T1 epoch-millis path (the java oracle mirrors only the formatter path,
    # so the harness computes the spec's expectation directly: millis since
    # epoch, decimal part = sub-milli down to ns; out of pandas ns range =>
    # per-row reject, never a crash)
    from decimal import Decimal
    t1_hard = 0
    for _ in range(max(200, n // 20)):
        ms = rng.choice([
            rng.randint(10**11, 2 * 10**12),          # plausible modern millis
            rng.randint(10**15, 10**19),              # micro/nano confusion
            Decimal(rng.randint(10**11, 2 * 10**12)) + Decimal(rng.randint(0, 10**6)) / 10**6,
        ])
        ov = ours("", "", "", str(ms))
        ns_total = int(Decimal(str(ms)) * 1_000_000)
        in_range = pd.Timestamp.min.value <= ns_total <= pd.Timestamp.max.value
        if ov.startswith("CRASH"):
            t1_hard += 1
            print(f"HARD t1-batch-killer {ms} -> {ov}")
        elif ov.startswith("REJECT"):
            if in_range:
                t1_hard += 1
                print(f"HARD t1-false-reject {ms} -> {ov}")
        else:
            sec, frac = ov.split(".")
            if int(sec) * 10**9 + int(frac) != ns_total:
                t1_hard += 1
                print(f"HARD t1-value {ms} -> {ov} != {ns_total}")
        if t1_hard > 5:
            break

    hard, both_reject, agree = t1_hard, 0, 0
    suspects: list[tuple[tuple, str]] = []  # month-leniency cases to re-check
    for case, jv in zip(cases, java_out):
        ov = ours(*case)
        if ov.startswith("CRASH"):
            hard += 1
            print(f"HARD batch-killer-exception {case} -> {ov}")
        elif jv == "REJECT" and ov.startswith("REJECT"):
            both_reject += 1
        elif jv == "REJECT":
            if is_month_leniency_candidate(case[0], case[3]):
                suspects.append((case, ov))
            else:
                hard += 1
                print(f"HARD we-accept-java-rejects {case} -> {ov}")
        elif ov.startswith("REJECT"):
            hard += 1
            print(f"HARD we-reject-java-accepts {case} -> java {jv}, ours {ov}")
        elif jv != ov:
            hard += 1
            print(f"HARD instant-mismatch {case} -> java {jv}, ours {ov}")
        else:
            agree += 1
        if hard > 10:
            break

    # Second pass: a month-leniency acceptance is only OK if java agrees with
    # our instant once the month is canonicalized — otherwise some OTHER field
    # diverged and the month was masking it.
    lenient = 0
    canon_cases = []
    for (case, ov) in suspects:
        canon = canonicalize_month(case[0], case[3])
        canon_cases.append(((case, ov), (case[0], case[1], case[2], canon) if canon else None))
    to_run = [c for _, c in canon_cases if c is not None]
    canon_out = iter(run_java(to_run)) if to_run else iter(())
    for (case, ov), canon_case in canon_cases:
        jv2 = next(canon_out) if canon_case is not None else "REJECT"
        if canon_case is not None and jv2 == ov:
            lenient += 1
        else:
            hard += 1
            print(f"HARD masked-by-month-leniency {case} -> ours {ov}, "
                  f"java(canonical month) {jv2}")

    print(f"SUMMARY n={n} agree={agree} both_reject={both_reject} "
          f"documented_leniency={lenient} hard_failures={hard}")
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
