// Dump TextStyle.SHORT month names for EVERY locale this JDK exposes, in
// the same formatting context java.time's MMM pattern uses. Output: one TSV
// line per locale — languageTag<TAB>name1<TAB>...<TAB>name12 — with all
// non-ASCII escaped to \\uXXXX by the probe itself (JVM stdout encoding
// mangles UTF-8 otherwise; see cefspark/timestamps.py round-3 notes).
// Compile: javac -encoding UTF-8 tools/DumpMonths.java -d /tmp/monthdump
// Run:     java -cp /tmp/monthdump DumpMonths
import java.io.PrintStream;
import java.time.Month;
import java.time.format.TextStyle;
import java.util.Arrays;
import java.util.Locale;
import java.util.TreeSet;

public class DumpMonths {
  static String esc(String s) {
    StringBuilder b = new StringBuilder();
    for (int i = 0; i < s.length(); i++) {
      char c = s.charAt(i);
      if (c >= 32 && c < 127) b.append(c);
      else b.append(String.format("\\u%04x", (int) c));
    }
    return b.toString();
  }

  public static void main(String[] args) throws Exception {
    PrintStream out = new PrintStream(System.out, true, "UTF-8");
    TreeSet<String> tags = new TreeSet<>();
    for (Locale l : Locale.getAvailableLocales()) {
      if (!l.toLanguageTag().isEmpty() && !l.toLanguageTag().equals("und"))
        tags.add(l.toLanguageTag());
    }
    for (String tag : tags) {
      Locale loc = Locale.forLanguageTag(tag);
      StringBuilder line = new StringBuilder(tag);
      for (Month m : Month.values()) {
        line.append('\t').append(esc(m.getDisplayName(TextStyle.SHORT, loc)));
      }
      out.println(line);
    }
  }
}
