// Dump java.time's LOCALE-SENSITIVE `zzz` short-name -> zone resolution for
// the curated abbreviation set, across every locale this JDK exposes.
// Output TSV: languageTag<TAB>abbrev<TAB>zoneId-or-REJECT.
// Compile: javac -encoding UTF-8 tools/DumpZoneAbbrevs.java -d /tmp/zonedump
// Run:     java -cp /tmp/zonedump DumpZoneAbbrevs
import java.io.PrintStream;
import java.time.ZoneId;
import java.time.format.DateTimeFormatter;
import java.time.temporal.TemporalQueries;
import java.util.Locale;
import java.util.TreeSet;

public class DumpZoneAbbrevs {
  static final String[] ABBREVS = {
    "PST", "PDT", "MST", "MDT", "CST", "CDT", "EST", "EDT", "AKST", "AKDT",
    "HST", "BST", "CET", "CEST", "EET", "EEST", "JST", "KST", "AEST", "AEDT",
    "IST", "WET", "WEST", "GMT", "UTC"
  };

  public static void main(String[] args) throws Exception {
    PrintStream out = new PrintStream(System.out, true, "UTF-8");
    TreeSet<String> tags = new TreeSet<>();
    for (Locale l : Locale.getAvailableLocales()) {
      if (!l.toLanguageTag().isEmpty() && !l.toLanguageTag().equals("und"))
        tags.add(l.toLanguageTag());
    }
    for (String tag : tags) {
      Locale loc = Locale.forLanguageTag(tag);
      DateTimeFormatter fmt = DateTimeFormatter.ofPattern("zzz").withLocale(loc);
      for (String a : ABBREVS) {
        String res;
        try {
          ZoneId z = fmt.parse(a, TemporalQueries.zone());
          res = z.getId();
        } catch (Exception e) {
          res = "REJECT";
        }
        out.println(tag + "\t" + a + "\t" + res);
      }
    }
  }
}
