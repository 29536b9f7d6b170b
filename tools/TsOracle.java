// Faithful java.time oracle for the reference timestamp normalizer
// (/root/reference/lib/logstash/codecs/cef/timestamp_normalizer.rb): same
// pattern, same parseBest chain, same resolve-assuming-year logic, with the
// spec's injected fixed Clock. Reads TSV lines `locale<TAB>tz<TAB>dtz<TAB>value`
// on stdin; prints `epochSecond.nanos` or `REJECT` per line.
// Compile: javac -encoding UTF-8 tools/TsOracle.java -d /tmp/tsoracle
import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.io.PrintStream;
import java.time.Clock;
import java.time.Instant;
import java.time.LocalTime;
import java.time.MonthDay;
import java.time.OffsetDateTime;
import java.time.ZoneId;
import java.time.ZonedDateTime;
import java.time.format.DateTimeFormatter;
import java.time.temporal.TemporalAccessor;
import java.util.Locale;

public class TsOracle {
  static final Clock CLOCK = Clock.fixed(Instant.parse("2026-08-16T00:00:00Z"), ZoneId.of("UTC"));

  public static void main(String[] args) throws Exception {
    BufferedReader in = new BufferedReader(new InputStreamReader(System.in, "UTF-8"));
    PrintStream out = new PrintStream(System.out, true, "UTF-8");
    String line;
    while ((line = in.readLine()) != null) {
      String[] f = line.split("\t", -1);
      try {
        Locale loc = f[0].isEmpty() ? Locale.ENGLISH
            : Locale.forLanguageTag(f[0].replace('_', '-'));
        ZoneId zone = f[1].isEmpty() ? ZoneId.of("UTC") : ZoneId.of(f[1]);
        DateTimeFormatter fmt = DateTimeFormatter
            .ofPattern("MMM dd[ yyyy] HH:mm:ss[.SSSSSSSSS][.SSSSSS][.SSS][ zzz]")
            .withZone(zone).withLocale(loc);
        if (!f[2].isEmpty()) fmt = fmt.withZone(ZoneId.of(f[2]));  // dtz side channel
        TemporalAccessor best = fmt.parseBest(f[3],
            ZonedDateTime::from, OffsetDateTime::from, TsOracle::resolveAssumingYear);
        Instant inst = best instanceof ZonedDateTime ? ((ZonedDateTime) best).toInstant()
                     : ((OffsetDateTime) best).toInstant();
        out.println(inst.getEpochSecond() + "." + String.format("%09d", inst.getNano()));
      } catch (Exception e) {
        out.println("REJECT");
      }
    }
  }

  static ZonedDateTime resolveAssumingYear(TemporalAccessor t) {
    MonthDay md = MonthDay.from(t);
    LocalTime lt = LocalTime.from(t);
    ZoneId zone = ZoneId.from(t);
    ZonedDateTime now = ZonedDateTime.now(CLOCK.withZone(zone));
    ZonedDateTime cur = ZonedDateTime.of(md.atYear(now.getYear()), lt, zone);
    if (cur.isAfter(now.plusDays(2))) {
      return ZonedDateTime.of(md.atYear(now.getYear() - 1), lt, zone);
    } else if (now.getMonthValue() == 12 && !cur.plusYears(1).isAfter(now.plusDays(2))) {
      return ZonedDateTime.of(md.atYear(now.getYear() + 1), lt, zone);
    }
    return cur;
  }
}
