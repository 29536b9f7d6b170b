"""Timestamp normalizer corpus — transliteration of
/root/reference/spec/codecs/cef/timestamp_normalizer_spec.rb, including the
year-inference sweep with an injected clock."""

import pandas as pd
import pytest

from cefspark.timestamps import InvalidTimestamp, TimestampNormalizer


def iso(t: pd.Timestamp) -> str:
    ns = t.microsecond * 1000 + t.nanosecond
    return f"{t.strftime('%Y-%m-%dT%H:%M:%S')}.{ns:09d}Z"


def test_explicit_year_with_default_zone():
    # spec :14-19 (zone comes from configured timezone)
    n = TimestampNormalizer(timezone="America/New_York")
    assert iso(n.normalize("Jun 17 2027 17:57:06.456")) == "2027-06-17T21:57:06.456000000Z"


def test_unparsable_raises():
    # spec :21-26
    n = TimestampNormalizer()
    with pytest.raises(InvalidTimestamp):
        n.normalize("Last Thursday")


def test_device_timezone_side_channel():
    # spec :28-38
    n = TimestampNormalizer()
    got = n.normalize("Jun 17 2027 17:57:06.456", "America/New_York")
    assert iso(got) == "2027-06-17T21:57:06.456000000Z"


def test_embedded_offset_beats_side_channel():
    # spec :39-45
    n = TimestampNormalizer()
    got = n.normalize("Jun 17 2027 17:57:06.456 -07:00", "America/New_York")
    assert iso(got) == "2027-06-18T00:57:06.456000000Z"


def test_epoch_millis():
    # spec :46-53
    n = TimestampNormalizer()
    got = n.normalize("1616623591694")
    assert got == pd.Timestamp("2021-03-24T22:06:31.694", tz="UTC")


def test_epoch_millis_sub_milli_precision():
    # spec :54-69
    n = TimestampNormalizer()
    assert iso(n.normalize("1616623591694.176")) == "2021-03-24T22:06:31.694176000Z"
    assert iso(n.normalize("1616623591694.176789")) == "2021-03-24T22:06:31.694176789Z"


def test_numeric_input():
    n = TimestampNormalizer()
    assert n.normalize(1616623591694) == pd.Timestamp("2021-03-24T22:06:31.694", tz="UTC")


def test_locale_de_month_abbreviations():
    # spec :72-95
    n = TimestampNormalizer(locale="de_DE")
    got = n.normalize("Mär 17 2019 17:57:06.456 +01:00")
    assert iso(got) == "2019-03-17T16:57:06.456000000Z"
    # post-CLDR "Mrz" form also accepted
    got2 = n.normalize("Mrz 17 2019 17:57:06.456 +01:00")
    assert iso(got2) == "2019-03-17T16:57:06.456000000Z"


@pytest.mark.parametrize("frac,expected_iso", [
    ("", "2021-03-17T12:34:56.000000000Z"),
    (".987", "2021-03-17T12:34:56.987000000Z"),
    (".987654", "2021-03-17T12:34:56.987654000Z"),
    (".987654321", "2021-03-17T12:34:56.987654321Z"),
])
def test_subsecond_precision(frac, expected_iso):
    # spec :97-129
    n = TimestampNormalizer()
    assert iso(n.normalize(f"Mar 17 2021 12:34:56{frac} +00:00")) == expected_iso


# --- year inference (spec :131-272) ------------------------------------------
# The spec sweeps 78 dates x 4 simulated "now" offsets with a fixed injected
# Clock; we reproduce the decision table directly.

def infer(value, now):
    return TimestampNormalizer(now=now).normalize(value)


def test_yearless_recent_past_is_current_year():
    # parsing a date ~30s in the past
    got = infer("Jun 15 10:00:00.000", now="2026-06-15T10:00:30Z")
    assert got.year == 2026


def test_yearless_slightly_future_within_2d_is_current_year():
    got = infer("Jun 16 10:00:00.000", now="2026-06-15T10:00:00Z")
    assert got.year == 2026


def test_yearless_far_future_is_previous_year():
    # on May 12, a date from May 15+ is plausibly from the prior year
    got = infer("May 20 10:00:00.000", now="2026-05-12T00:00:00Z")
    assert got.year == 2025


def test_yearless_december_rollover_to_next_year():
    # on Dec 31, a Jan 1 date is from the very-near next year
    got = infer("Jan 01 00:10:00.000", now="2026-12-31T23:59:00Z")
    assert got.year == 2027


def test_yearless_december_far_date_stays_current_year():
    got = infer("Dec 30 10:00:00.000", now="2026-12-31T23:59:00Z")
    assert got.year == 2026


def test_yearless_11_5_months_ago_is_previous_year():
    # now ~11.5 months after the date -> previous calendar year
    got = infer("Jul 01 12:00:00.000", now="2026-06-15T00:00:00Z")
    assert got.year == 2025


def test_feb29_clamps_in_non_leap_year():
    got = infer("Feb 29 12:00:00.000", now="2026-03-01T00:00:00Z")
    assert (got.month, got.day) == (2, 28)
    assert got.year == 2026


def test_year_inference_respects_zone():
    # moments around midnight differ by zone; ensure comparison happens in the
    # parsed zone like the reference (timestamp_normalizer.rb:94)
    got = infer("Jan 01 00:10:00.000 +00:00", now="2026-12-31T23:59:00Z")
    assert got.year == 2027


def test_sweep_against_pure_python_reference():
    """Dense sweep (like spec :131-272): every ~5 days x 4 'now' offsets,
    validated against an independent implementation of the rule."""
    import datetime as dt

    def expected_year(mon, day, now):
        def at(y):
            d = day
            if mon == 2 and d == 29 and not (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
                d = 28
            return dt.datetime(y, mon, d, 12, 0, 0, tzinfo=dt.timezone.utc)
        horizon = now + dt.timedelta(days=2)
        if at(now.year) > horizon:
            return now.year - 1
        if now.month == 12 and at(now.year + 1) <= horizon:
            return now.year + 1
        return now.year

    months_days = [(m, d) for m in range(1, 13) for d in (1, 10, 20, 28)]
    offsets = [dt.timedelta(seconds=-30), dt.timedelta(weeks=-1),
               dt.timedelta(days=-350), dt.timedelta(days=1, hours=12)]
    for mon, day in months_days:
        base = dt.datetime(2026, mon, day, 12, 0, 0, tzinfo=dt.timezone.utc)
        for off in offsets:
            now = base - off  # now = event_time - offset (offset<0 => now after event)
            got = infer(f"{['Jan','Feb','Mar','Apr','May','Jun','Jul','Aug','Sep','Oct','Nov','Dec'][mon-1]}"
                        f" {day:02d} 12:00:00.000 +00:00", now=pd.Timestamp(now))
            assert got.year == expected_year(mon, day, now), (mon, day, now)


@pytest.mark.parametrize("zone,off_h", [
    ("GMT+05:30", 5.5), ("UTC+3", 3.0), ("UT-02:00", -2.0), ("GMT-0800", -8.0),
])
def test_offset_prefixed_zone_spellings(zone, off_h):
    # java ZoneId.of accepts GMT/UTC/UT-prefixed offsets; common in dtz values
    n = TimestampNormalizer()
    got = n.normalize("Sep 07 2018 12:00:00", zone)
    expected = pd.Timestamp("2018-09-07T12:00:00Z") - pd.Timedelta(hours=off_h)
    assert got == expected


@pytest.mark.parametrize("bad", ["+24", "+19", "UTC+25", "+300", "+530", "+18:30"])
def test_invalid_offsets_fail_per_row_not_crash(bad):
    # java ZoneOffset caps at +/-18:00 and rejects free-form digit runs; these
    # must become per-row parse failures, never escape as ValueError
    n = TimestampNormalizer()
    with pytest.raises(InvalidTimestamp):
        n.normalize("Sep 07 2018 12:00:00", bad)


def test_offset_18_exact_is_valid():
    # java-verified: the in-payload text position takes only the colon form
    # (+18 rejects there), while ZoneId.of accepts the short spelling via dtz
    n = TimestampNormalizer()
    got = n.normalize("Sep 07 2018 18:00:00 +18:00")
    assert got == pd.Timestamp("2018-09-07T00:00:00Z")
    assert n.normalize("Sep 07 2018 18:00:00", "+18") == pd.Timestamp("2018-09-07T00:00:00Z")
    with pytest.raises(InvalidTimestamp):
        n.normalize("Sep 07 2018 18:00:00 +18")  # short form invalid in text position


def test_zone_abbreviations_resolve_like_java_zzz():
    # java's `zzz` parser maps short names to CLDR preferred region zones;
    # local times then resolve under full DST rules (PST on a July date ->
    # -07:00). Expected instants verified by running java.time on this JDK.
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    assert n.normalize_iso("Jun 07 2025 12:00:00 PDT") == "2025-06-07T19:00:00.000000000Z"
    assert n.normalize_iso("Jun 07 2025 12:00:00 PST") == "2025-06-07T19:00:00.000000000Z"
    assert n.normalize_iso("Jan 07 2025 12:00:00 PST") == "2025-01-07T20:00:00.000000000Z"
    assert n.normalize_iso("Jan 07 2025 12:00:00 CET") == "2025-01-07T11:00:00.000000000Z"
    # java resolves BST to Pacific/Bougainville (+11), not Europe/London
    assert n.normalize_iso("Jul 07 2025 12:00:00 BST") == "2025-07-07T01:00:00.000000000Z"


def test_dtz_side_channel_uses_strict_zoneid_semantics():
    # the dtz path is ZoneId.of in the reference: bare abbreviations are
    # rejected (including EST/MST/HST, which ZoneInfo alone would accept),
    # while real tzdb zones CET/EET and region ids/offsets resolve
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    for bad in ("PST", "EDT", "EST", "MST", "HST", "BST"):
        with pytest.raises(InvalidTimestamp):
            n.normalize("Jul 07 2025 12:00:00", device_timezone=bad)
    assert n.normalize_iso("Jul 07 2025 12:00:00", "CET") == "2025-07-07T10:00:00.000000000Z"
    assert n.normalize_iso("Jul 07 2025 12:00:00", "America/New_York") == "2025-07-07T16:00:00.000000000Z"


def test_single_digit_day_rejected_like_java_dd():
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    with pytest.raises(InvalidTimestamp):
        n.normalize("Jun 7 2025 12:00:00")
    assert n.normalize_iso("Jun 07 2025 12:00:00") == "2025-06-07T12:00:00.000000000Z"


@pytest.mark.parametrize("locale,text,expect", [
    # CLDR primary forms dumped from this JDK (java-verified)
    ("de_DE", "März 17 2019 17:57:06 +01:00", "2019-03-17T16:57:06"),
    ("de_DE", "Sept. 17 2019 17:57:06 +01:00", "2019-09-17T16:57:06"),
    ("fr_FR", "août 17 2019 17:57:06 +01:00", "2019-08-17T16:57:06"),
    ("it_IT", "mag 17 2019 17:57:06 +01:00", "2019-05-17T16:57:06"),
    ("pt_BR", "out. 17 2019 17:57:06 +01:00", "2019-10-17T16:57:06"),
    ("nl_NL", "mrt. 17 2019 17:57:06 +01:00", "2019-03-17T16:57:06"),
    ("pl_PL", "paź 17 2019 17:57:06 +01:00", "2019-10-17T16:57:06"),
    ("cs_CZ", "čvc 17 2019 17:57:06 +01:00", "2019-07-17T16:57:06"),
    ("tr_TR", "Şub 17 2019 17:57:06 +01:00", "2019-02-17T16:57:06"),
    ("fi_FI", "kesäk. 17 2019 17:57:06 +01:00", "2019-06-17T16:57:06"),
    # COMPAT-provider / legacy dotless aliases remain accepted
    ("de_DE", "Jan 17 2019 17:57:06 +01:00", "2019-01-17T16:57:06"),
    ("fr_FR", "janv 17 2019 17:57:06 +01:00", "2019-01-17T16:57:06"),
    ("es_ES", "sept 17 2019 17:57:06 +01:00", "2019-09-17T16:57:06"),
    # round-3 locales (CLDR primaries, java-verified via /tmp MonthDump)
    ("ru_RU", "сент. 17 2019 17:57:06 +03:00", "2019-09-17T14:57:06"),
    ("ja_JP", "9月 17 2019 17:57:06 +09:00", "2019-09-17T08:57:06"),
    ("zh_CN", "10月 17 2019 17:57:06 +08:00", "2019-10-17T09:57:06"),
    ("ko_KR", "5월 17 2019 17:57:06 +09:00", "2019-05-17T08:57:06"),
    ("hu_HU", "márc. 17 2019 17:57:06 +01:00", "2019-03-17T16:57:06"),
    ("el_GR", "Μαΐ 17 2019 17:57:06 +03:00", "2019-05-17T14:57:06"),
    ("uk_UA", "груд. 17 2019 17:57:06 +02:00", "2019-12-17T15:57:06"),
    ("hr_HR", "ožu 17 2019 17:57:06 +01:00", "2019-03-17T16:57:06"),
    ("lv_LV", "jūl. 17 2019 17:57:06 +03:00", "2019-07-17T14:57:06"),
    ("et_EE", "märts 17 2019 17:57:06 +02:00", "2019-03-17T15:57:06"),
])
def test_locale_month_tables_match_jdk_cldr(locale, text, expect):
    n = TimestampNormalizer(locale=locale)
    assert n.normalize_iso(text).startswith(expect)


@pytest.mark.parametrize("locale,text,month", [
    # COMPAT-provider forms (java.locale.providers=COMPAT dump from this JDK)
    ("sv_SE", "mar 17 2019 17:57:06 +01:00", 3),
    ("sv_SE", "jun 17 2019 17:57:06 +01:00", 6),
    ("cs_CZ", "Čer 17 2019 17:57:06 +01:00", 6),
    ("fi_FI", "kesäkuuta 17 2019 17:57:06 +01:00", 6),
    ("pt_PT", "out 17 2019 17:57:06 +01:00", 10),
    ("nl_NL", "mrt 17 2019 17:57:06 +01:00", 3),
    ("nb_NO", "des 17 2019 17:57:06 +01:00", 12),
    # round-3 COMPAT forms (java.locale.providers=COMPAT, /tmp MonthDump):
    # ru short names, ja bare digits, zh CJK ordinals, bg Roman numerals —
    # all genuinely what a COMPAT JVM parses for MMM under these locales
    ("ru_RU", "сен 17 2019 17:57:06 +03:00", 9),
    ("ja_JP", "11 17 2019 17:57:06 +09:00", 11),
    ("zh_CN", "十一月 17 2019 17:57:06 +08:00", 11),
    ("bg_BG", "VII 17 2019 17:57:06 +03:00", 7),
    ("ro_RO", "Iun 17 2019 17:57:06 +03:00", 6),
    ("lt_LT", "Rgp 17 2019 17:57:06 +03:00", 8),
])
def test_compat_provider_month_forms_accepted(locale, text, month):
    n = TimestampNormalizer(locale=locale)
    assert n.normalize(text).month == month


@pytest.mark.parametrize("value,expect_prefix", [
    # java SMART clamps over-length days to the month's last day
    ("Feb 31 1989 22:11:59", "1989-02-28T22:11:59"),
    ("Apr 31 2020 01:02:03", "2020-04-30T01:02:03"),
    ("Feb 29 2024 12:00:00", "2024-02-29T12:00:00"),
])
def test_smart_day_clamping_matches_java(value, expect_prefix):
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    assert n.normalize_iso(value).startswith(expect_prefix)


@pytest.mark.parametrize("value", [
    "Mar 00 2020 12:00:00",     # day 0: java SMART rejects
    "Mar 10 2020 24:00:01",     # hour 24 only valid as exactly 24:00:00
    "Mar 10 2020 24:30:00",
    "Mar 10 2020 24:00:00.500",
    "Mar 10 2020 12:60:00",     # minute 60
    "Mar 10 2020 12:00:60",     # second 60
    "Apr 31 01:02:03",          # yearless over-length day: MonthDay rejects
    "Feb 30 01:02:03",
])
def test_out_of_range_fields_fail_per_row_not_valueerror(value):
    # these must surface as InvalidTimestamp (a per-row parse failure), never
    # a ValueError that would kill the whole Arrow batch — all java-verified
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    with pytest.raises(InvalidTimestamp):
        n.normalize(value)


def test_hour_24_exact_is_end_of_day_midnight():
    # java-verified: with a year the resolver carries the excess day (next-day
    # midnight); on the yearless path the excess day is dropped
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    assert n.normalize_iso("Mar 10 2020 24:00:00") == "2020-03-11T00:00:00.000000000Z"
    assert n.normalize_iso("Mar 10 24:00:00") == "2026-03-10T00:00:00.000000000Z"


def test_yearless_feb29_clamps_but_feb30_rejects():
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    assert n.normalize_iso("Feb 29 01:02:03").startswith("2026-02-28T01:02:03")
    with pytest.raises(InvalidTimestamp):
        n.normalize("Feb 30 01:02:03")


def test_hour_24_with_zero_fraction_is_valid():
    # java checks the fraction's value, not its absence (java-verified)
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    assert n.normalize_iso("Mar 10 2020 24:00:00.000") == "2020-03-11T00:00:00.000000000Z"
    with pytest.raises(InvalidTimestamp):
        n.normalize("Mar 10 2020 24:00:00.001")


def test_out_of_representable_range_fails_per_row():
    # Python/pandas representational ceilings surface as parse failures,
    # never as batch-killing OutOfBoundsDatetime/OverflowError
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    with pytest.raises(InvalidTimestamp):
        n.normalize("Mar 10 2500 12:00:00.123456789")  # ns range ends 2262
    with pytest.raises(InvalidTimestamp):
        n.normalize("Dec 31 9999 24:00:00")  # year-10000 rollover


def test_epoch_millis_out_of_range_fails_per_row():
    # micro/nano-confused producers (epoch micros in rt=) must fail the row
    # as InvalidTimestamp, never escape as OutOfBoundsDatetime
    n = TimestampNormalizer(now="2026-08-16T00:00:00Z")
    with pytest.raises(InvalidTimestamp):
        n.normalize("1755302400000000")  # epoch MICROseconds -> year ~57588
    with pytest.raises(InvalidTimestamp):
        n.normalize("99999999999999999999")


def test_resolve_month_temporary_table_never_misresolves():
    """ADVICE r3: id()-reuse after GC of a caller-temporary table must not
    serve another table's lowered cache — the cache pins the keyed table."""
    import gc

    from cefspark import timestamps

    for i in range(50):
        tbl = {f"Mo{i}": i + 1, "Zzz": 12}
        assert timestamps.resolve_month(dict(tbl), f"MO{i}") == i + 1
        gc.collect()
    # cache stays bounded even under a churn of temporaries
    assert len(timestamps._LOWER_TABLES) <= timestamps._LOWER_TABLES_CAP
    # and every cached entry still matches the object it was built from
    for _id, (tbl, lowered) in timestamps._LOWER_TABLES.items():
        assert id(tbl) == _id
        assert lowered == {k.lower(): v for k, v in tbl.items()}


def test_zone_abbreviations_are_locale_sensitive():
    """Round-4: java's zzz short-name resolution varies by locale (dumped
    matrix in cefspark.locale_zones). CST: America/Chicago under en,
    Asia/Shanghai under en-001 (international English); a qualified tag
    with its own dump entry is authoritative over its language (ff-Adlm-GH
    keeps BASE's Bougainville BST while bare ff maps it to Abidjan)."""
    from cefspark.timestamps import (TimestampNormalizer, _zone_abbrev_map)

    def instant(locale, value):
        return TimestampNormalizer(locale=locale, now="2026-08-16T00:00:00Z"
                                   ).normalize(value)

    v = "Jan 05 2020 12:00:00 CST"
    # en: America/Chicago (-6) -> 18:00Z; en-001: Asia/Shanghai (+8) -> 04:00Z
    assert str(instant("en", v)) == "2020-01-05 18:00:00+00:00"
    assert str(instant("en-001", v)) == "2020-01-05 04:00:00+00:00"
    # exact-tag authority over the language fallback
    assert _zone_abbrev_map("ff")["BST"] == "Africa/Abidjan"
    assert _zone_abbrev_map("ff-Adlm-GH")["BST"] == "Pacific/Bougainville"


def test_systemv_zones_match_jdk_rules():
    """The JDK-only SystemV legacy zones: old US DST rule (Sun >= Apr 24 to
    Sun >= Oct 25, 02:00 wall), java-verified via ZoneRules — distinct from
    the modern US rule in the Mar/Apr and Oct/Nov windows."""
    import datetime as dt

    from cefspark.timestamps import _SYSTEMV_ZONES

    z = _SYSTEMV_ZONES["SystemV/EST5EDT"]
    # 2020: spring transition Apr 26 (modern US rule was Mar 8)
    assert dt.datetime(2020, 4, 25, 12, tzinfo=z).utcoffset() == dt.timedelta(hours=-5)
    assert dt.datetime(2020, 4, 26, 12, tzinfo=z).utcoffset() == dt.timedelta(hours=-4)
    # fall transition Oct 25 (modern US rule was Nov 1)
    assert dt.datetime(2020, 10, 24, 12, tzinfo=z).utcoffset() == dt.timedelta(hours=-4)
    assert dt.datetime(2020, 10, 25, 12, tzinfo=z).utcoffset() == dt.timedelta(hours=-5)
    # fixed variants carry no DST
    hst = _SYSTEMV_ZONES["SystemV/HST10"]
    assert dt.datetime(2020, 7, 1, tzinfo=hst).utcoffset() == dt.timedelta(hours=-10)


def test_full_locale_month_tables_resolve():
    """Every dumped JDK locale resolves to a 12-month table whose primary
    forms map 1..12 exactly once; qualified tags pick their own CLDR table
    (de-AT January short name differs from de)."""
    from cefspark import locale_months as lm
    from cefspark.timestamps import _month_table

    assert len(lm.TAG_TO_TABLE) == 1015 and len(lm.TABLES) == 220
    assert len(lm.SPACED_TAGS) == 37  # spaced-month locales now parse too
    for tag in list(lm.TAG_TO_TABLE)[::37]:  # sampled sweep
        t = _month_table(tag)
        assert sorted(set(t.values())) == list(range(1, 13)), tag
    assert "Jän." in _month_table("de-AT")
    assert "Jän." not in _month_table("de")


def test_spaced_month_locales_parse():
    """vi/ca-style locales whose CLDR month names embed spaces (previously a
    documented gap): the normalizer compiles a longest-first alternation so
    'thg 12' wins over 'thg 1' and case-insensitive forms resolve."""
    from cefspark.timestamps import InvalidTimestamp, TimestampNormalizer

    vi = TimestampNormalizer(locale="vi", now="2026-08-16T00:00:00Z")
    assert str(vi.normalize("thg 12 05 2020 10:00:00 +07:00")) == \
        "2020-12-05 03:00:00+00:00"
    assert str(vi.normalize("thg 1 12 2020 10:00:00 Z")) == \
        "2020-01-12 10:00:00+00:00"
    ca = TimestampNormalizer(locale="ca", now="2026-08-16T00:00:00Z")
    assert str(ca.normalize("de gen. 05 2020 10:00:00 +01:00")) == \
        "2020-01-05 09:00:00+00:00"
    # dotless leniency + case-insensitivity apply to spaced forms too
    assert str(ca.normalize("DE MARÇ 15 2021 08:30:00")) == \
        "2021-03-15 08:30:00+00:00"
    # a spaced month under a NON-spaced locale still rejects
    import pytest as _pytest
    en = TimestampNormalizer(locale="en", now="2026-08-16T00:00:00Z")
    with _pytest.raises(InvalidTimestamp):
        en.normalize("thg 1 12 2020 10:00:00 Z")


def test_epoch_iso_fast_path_differential():
    """The integer-epoch ISO fast path (divmod rendering, no Decimal/pandas)
    must be bit-identical to the general normalize() rendering, including the
    out-of-range error text at the int64-ns boundary."""
    import random

    from cefspark.timestamps import InvalidTimestamp, TimestampNormalizer

    n = TimestampNormalizer(now="2026-08-15T00:00:00Z")
    rng = random.Random(0xCEF)
    cases = [str(rng.randint(1, 9_223_372_036_854)) for _ in range(2000)]
    cases += ["1", "999", "9223372036854", "86400000", "31535999999"]
    for c in cases:
        t = n.normalize(c)
        ns = t.microsecond * 1000 + t.nanosecond
        ref = f"{t.strftime('%Y-%m-%dT%H:%M:%S')}.{ns:09d}Z"
        assert n.normalize_iso(c) == ref, c
    # one past the largest representable epoch-millis: the fast path must
    # defer to the general path's canonical error, not silently wrap
    with pytest.raises(InvalidTimestamp, match="out of representable range"):
        n.normalize_iso("9223372036855")
    # fractional values bypass the fast path but stay exact
    assert n.normalize_iso("1700000000000.123456") == \
        "2023-11-14T22:13:20.000123456Z"


def test_zzz_gmt_utc_resolve_to_utc_directly():
    """ADVICE r4: when the locale table maps an abbreviation to GMT/UTC the
    resolver must return UTC from the TARGET, not re-parse the original
    abbreviation (which only worked while GMT->GMT mapped onto itself)."""
    import datetime as dt

    from cefspark.timestamps import _zone_of

    for abbrev in ("GMT", "UTC"):
        z = _zone_of(abbrev, allow_names=True, locale="en")
        assert z.utcoffset(None) == dt.timedelta(0)
