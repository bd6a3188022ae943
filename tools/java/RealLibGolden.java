// REAL-LIBRARY golden capture — closes the long-documented residual
// ("a byte capture from the real jars"): this container's pyspark
// distribution bundles the actual libraries the reference uses for its
// sketch wire formats — com.clearspring stream-2.9.8 (HyperLogLog) and
// org.apache.datasketches datasketches-java-6.2.0 (theta) — so the
// fixtures here are produced by the REAL implementations, not a
// re-derivation. Anything the JDK-17 re-derived goldens
// (ClearspringGolden.java / ThetaGolden.java) got wrong shows up as a
// mismatch against these bytes.
//
// Output: one JSON object on stdout -> tests/fixtures/reallib_golden.json
// Regenerate:
//   J=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
//   javac -encoding UTF-8 -cp "$J/*" RealLibGolden.java
//   java -Dfile.encoding=UTF-8 -cp ".:$J/*" RealLibGolden
import com.clearspring.analytics.stream.cardinality.HyperLogLog;
import org.apache.datasketches.theta.AnotB;
import org.apache.datasketches.theta.CompactSketch;
import org.apache.datasketches.theta.Intersection;
import org.apache.datasketches.theta.SetOperation;
import org.apache.datasketches.theta.Union;
import org.apache.datasketches.theta.UpdateSketch;

import java.util.ArrayList;
import java.util.List;

public class RealLibGolden {

    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder(b.length * 2);
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    static String jstr(String s) {
        return '"' + s.replace("\\", "\\\\").replace("\"", "\\\"") + '"';
    }

    static String hllRow(String name, int log2m, HyperLogLog h) throws Exception {
        return "{\"name\": " + jstr(name) + ", \"log2m\": " + log2m
                + ", \"cardinality\": " + h.cardinality()
                + ", \"hex\": " + jstr(hex(h.getBytes())) + "}";
    }

    static String thetaRow(String name, int k, CompactSketch cs) {
        return "{\"name\": " + jstr(name) + ", \"k\": " + k
                + ", \"estimate\": " + cs.getEstimate()
                + ", \"theta_long\": " + cs.getThetaLong()
                + ", \"retained\": " + cs.getRetainedEntries(true)
                + ", \"hex\": " + jstr(hex(cs.toByteArray())) + "}";
    }

    public static void main(String[] args) throws Exception {
        StringBuilder out = new StringBuilder("{\n");
        out.append("  \"jdk\": ").append(jstr(System.getProperty("java.version")))
           .append(",\n  \"stream_lib\": \"2.9.8\", \"datasketches\": \"6.2.0\",\n");

        // --- REAL clearspring HyperLogLog: the same blob cases the
        // JDK-17 re-derived goldens pin, now from the actual library
        out.append("  \"hll_blobs\": [\n");
        List<String> blobs = new ArrayList<>();
        for (int log2m : new int[] {8, 12, 16}) {
            HyperLogLog ints = new HyperLogLog(log2m);
            for (int i = 0; i < 500; i++) ints.offer(Integer.valueOf(i * 7 - 250));
            blobs.add(hllRow("ints_x500", log2m, ints));

            HyperLogLog longs = new HyperLogLog(log2m);
            for (long i = 0; i < 300; i++) longs.offer(Long.valueOf(i * 1_000_000_007L));
            blobs.add(hllRow("longs_x300", log2m, longs));

            HyperLogLog doubles = new HyperLogLog(log2m);
            for (int i = 0; i < 400; i++) doubles.offer(Double.valueOf(i * 0.37 - 20.0));
            blobs.add(hllRow("doubles_x400", log2m, doubles));

            HyperLogLog floats = new HyperLogLog(log2m);
            for (int i = 0; i < 400; i++) floats.offer(Float.valueOf(i * 0.37f - 20.0f));
            blobs.add(hllRow("floats_x400", log2m, floats));

            HyperLogLog strs = new HyperLogLog(log2m);
            for (int i = 0; i < 350; i++) strs.offer("doc-" + i + "-body");
            blobs.add(hllRow("strings_x350", log2m, strs));

            HyperLogLog merged = new HyperLogLog(log2m);
            merged.addAll(ints);
            merged.addAll(strs);
            blobs.add(hllRow("merged_ints_strings", log2m, merged));

            HyperLogLog empty = new HyperLogLog(log2m);
            blobs.add(hllRow("empty", log2m, empty));
        }
        for (int b = 0; b < blobs.size(); b++)
            out.append("    ").append(blobs.get(b))
               .append(b < blobs.size() - 1 ? ",\n" : "\n");
        out.append("  ],\n");

        // --- REAL datasketches theta: compact ordered serialization of
        // the shapes operators/theta_ds.py writes and reads
        out.append("  \"theta\": [\n");
        List<String> rows = new ArrayList<>();

        UpdateSketch empty = UpdateSketch.builder().setNominalEntries(4096).build();
        rows.add(thetaRow("empty", 4096, empty.compact(true, null)));

        UpdateSketch single = UpdateSketch.builder().setNominalEntries(4096).build();
        single.update(7L);
        rows.add(thetaRow("single_long7", 4096, single.compact(true, null)));

        UpdateSketch exact = UpdateSketch.builder().setNominalEntries(256).build();
        for (long v = 1; v <= 20; v++) exact.update(v);
        rows.add(thetaRow("exact_longs_1_20", 256, exact.compact(true, null)));

        UpdateSketch strs = UpdateSketch.builder().setNominalEntries(4096).build();
        for (String s : new String[] {"a", "hurricane", "the quick brown fox",
                                      "日本語", "café",
                                      new String(Character.toChars(0x1F600))})
            strs.update(s);
        rows.add(thetaRow("strings6", 4096, strs.compact(true, null)));

        UpdateSketch dbls = UpdateSketch.builder().setNominalEntries(4096).build();
        for (double d : new double[] {0.0, -0.0, 1.5, -2.75, 1e300, 4.9e-324,
                                      Double.NaN,
                                      Double.longBitsToDouble(0x7ff8000000000001L)})
            dbls.update(d);
        rows.add(thetaRow("doubles8_nan_negzero", 4096, dbls.compact(true, null)));

        // estimation regime: 10k distinct into k=16 — pins the REAL
        // QuickSelect retention + 3-preamble-long layout for the
        // read-their-bytes/write-bytes-they-read interop contract
        UpdateSketch est = UpdateSketch.builder().setNominalEntries(16).build();
        for (long v = 0; v < 10_000; v++) est.update(v);
        rows.add(thetaRow("estimating_k16_n10000", 16, est.compact(true, null)));

        // set operations over two overlapping exact sketches
        UpdateSketch a = UpdateSketch.builder().setNominalEntries(256).build();
        for (long v = 0; v < 10; v++) a.update(v);
        UpdateSketch b = UpdateSketch.builder().setNominalEntries(256).build();
        for (long v = 5; v < 20; v++) b.update(v);
        rows.add(thetaRow("setop_a", 256, a.compact(true, null)));
        rows.add(thetaRow("setop_b", 256, b.compact(true, null)));
        Union u = SetOperation.builder().setNominalEntries(256).buildUnion();
        u.union(a);
        u.union(b);
        rows.add(thetaRow("union_ab", 256, u.getResult(true, null)));
        Intersection ix = SetOperation.builder().buildIntersection();
        ix.intersect(a);
        ix.intersect(b);
        rows.add(thetaRow("intersect_ab", 256, ix.getResult(true, null)));
        AnotB diff = SetOperation.builder().buildANotB();
        diff.setA(a);
        diff.notB(b);
        rows.add(thetaRow("anotb_ab", 256, diff.getResult(true, null, true)));

        for (int r = 0; r < rows.size(); r++)
            out.append("    ").append(rows.get(r))
               .append(r < rows.size() - 1 ? ",\n" : "\n");
        out.append("  ]\n}\n");
        System.out.print(out);
    }
}
