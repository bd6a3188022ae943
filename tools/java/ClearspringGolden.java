// Golden-vector generator for operators/clearspring_hll.py, run on the
// REAL JDK (17 in this container): captures ground truth for the parts
// of the wire contract that depend on Java semantics rather than on any
// library — Double/Float.toString (shortest-decimal rendering changed in
// JDK 19, JDK-4511638), Math.round (incl. the Infinity -> Long.MAX_VALUE
// branch stream-lib's small-range estimate hits when no register is
// zero), Long.numberOfLeadingZeros, and big-endian DataOutputStream
// serialization. The HyperLogLog/RegisterSet/MurmurHash2-64A algorithm
// itself is re-derived here from the PUBLIC stream-lib format
// (com.clearspring.analytics:stream, Apache-2.0; HyperLogLog.java
// offer(Object) -> 32-bit MurmurHash.hash + offerHashed(int) (r12) /
// MurmurHash.hash64 seed 0xe17a1465) — the library jar is not in this
// container, so these fixtures pin Java-semantics parity; a live
// stream-lib byte capture remains the documented residual.
//
// Output: one JSON object on stdout -> tests/fixtures/clearspring_jdk17_golden.json
// Regenerate: javac ClearspringGolden.java && java ClearspringGolden
import java.io.ByteArrayOutputStream;
import java.io.DataOutputStream;
import java.io.IOException;
import java.nio.charset.StandardCharsets;
import java.util.ArrayList;
import java.util.List;

public class ClearspringGolden {

    // MurmurHash2-64A over bytes, the published stream-lib
    // MurmurHash.hash64(byte[], int) algorithm (seed 0xe17a1465).
    static long hash64(byte[] data, int seed) {
        final long m = 0xc6a4a7935bd1e995L;
        final int r = 47;
        long h = (seed & 0xffffffffL) ^ (data.length * m);
        int len8 = data.length / 8;
        for (int i = 0; i < len8; i++) {
            int i8 = i * 8;
            long k = ((long) data[i8] & 0xff)
                    | (((long) data[i8 + 1] & 0xff) << 8)
                    | (((long) data[i8 + 2] & 0xff) << 16)
                    | (((long) data[i8 + 3] & 0xff) << 24)
                    | (((long) data[i8 + 4] & 0xff) << 32)
                    | (((long) data[i8 + 5] & 0xff) << 40)
                    | (((long) data[i8 + 6] & 0xff) << 48)
                    | (((long) data[i8 + 7] & 0xff) << 56);
            k *= m;
            k ^= k >>> r;
            k *= m;
            h ^= k;
            h *= m;
        }
        switch (data.length % 8) {
            case 7: h ^= (long) (data[(data.length & ~7) + 6] & 0xff) << 48;
            case 6: h ^= (long) (data[(data.length & ~7) + 5] & 0xff) << 40;
            case 5: h ^= (long) (data[(data.length & ~7) + 4] & 0xff) << 32;
            case 4: h ^= (long) (data[(data.length & ~7) + 3] & 0xff) << 24;
            case 3: h ^= (long) (data[(data.length & ~7) + 2] & 0xff) << 16;
            case 2: h ^= (long) (data[(data.length & ~7) + 1] & 0xff) << 8;
            case 1: h ^= (long) (data[data.length & ~7] & 0xff);
                    h *= m;
        }
        h ^= h >>> r;
        h *= m;
        h ^= h >>> r;
        return h;
    }

    // 32-bit MurmurHash2 (MurmurHash.hash(byte[], len, seed); the
    // hash(byte[]) entry passes seed -1) and hashLong — the entry
    // points HyperLogLog.offer(Object) actually uses (round-12).
    static int hash32(byte[] data, int seed) {
        final int m = 0x5bd1e995;
        final int r = 24;
        int len = data.length;
        int h = seed ^ len;
        int len4 = len >> 2;
        for (int i = 0; i < len4; i++) {
            int i4 = i << 2;
            int k = data[i4 + 3];
            k = (k << 8) | (data[i4 + 2] & 0xff);
            k = (k << 8) | (data[i4 + 1] & 0xff);
            k = (k << 8) | (data[i4] & 0xff);
            k *= m;
            k ^= k >>> r;
            k *= m;
            h *= m;
            h ^= k;
        }
        int left = len - (len4 << 2);
        if (left != 0) {
            // Java signed-byte tail XORs, verbatim
            if (left >= 3) h ^= (int) data[len - 3] << 16;
            if (left >= 2) h ^= (int) data[len - 2] << 8;
            if (left >= 1) h ^= (int) data[len - 1];
            h *= m;
        }
        h ^= h >>> 13;
        h *= m;
        h ^= h >>> 15;
        return h;
    }

    static int hashLong(long data) {
        final int m = 0x5bd1e995;
        final int r = 24;
        int h = 0;
        int k = (int) data * m;
        k ^= k >>> r;
        h ^= k * m;
        k = (int) (data >> 32) * m;
        k ^= k >>> r;
        h *= m;
        h ^= k * m;
        h ^= h >>> 13;
        h *= m;
        h ^= h >>> 15;
        return h;
    }

    // RegisterSet: six 5-bit registers per int word, word count padded
    // per the published sizing rule.
    static int wordsFor(int count) {
        int words = count / 6;
        if (words == 0) return 1;
        if (words % 32 == 0) return words;
        return words + 1;
    }

    static final class Hll {
        final int log2m;
        final int[] regs;

        Hll(int log2m) {
            this.log2m = log2m;
            this.regs = new int[1 << log2m];
        }

        // ROUND-12 correction (caught by the real-jar capture,
        // RealLibGolden.java / tests/test_reallib_golden.py): the real
        // HyperLogLog.offer(Object) routes through the 32-BIT
        // MurmurHash.hash(Object) and offerHashed(int) — hash64 belongs
        // to HyperLogLogPlus. The earlier re-derivation offered 64-bit
        // toString hashes here, which put every register in the wrong
        // place. Numbers hash by RAW BITS through hashLong; strings by
        // their UTF-8 bytes through the 32-bit byte hash (seed -1).
        void offer(Object o) {
            if (o instanceof Long) offerHashed(hashLong((Long) o));
            else if (o instanceof Integer) offerHashed(hashLong((Integer) o));
            else if (o instanceof Double)
                offerHashed(hashLong(Double.doubleToRawLongBits((Double) o)));
            else if (o instanceof Float)
                offerHashed(hashLong(Float.floatToRawIntBits((Float) o)));
            else offerHashed(hash32(o.toString().getBytes(StandardCharsets.UTF_8), -1));
        }

        void offerHashed(int hashedValue) {
            // verbatim stream-lib offerHashed(int): the OR-mask is the
            // parenthesized shift plus one, (1 << (log2m-1)) + 1
            final int j = hashedValue >>> (Integer.SIZE - log2m);
            final int r = Integer.numberOfLeadingZeros(
                    (hashedValue << this.log2m) | (1 << (this.log2m - 1)) + 1) + 1;
            if (r > regs[j]) regs[j] = r;
        }

        long cardinality() {
            // stream-lib HyperLogLog.cardinality(): alphaMM per log2m,
            // UNCONDITIONAL linear counting when estimate <= 2.5m —
            // zeros == 0 gives Math.round(m * log(m/0.0)) = Long.MAX_VALUE
            double m = 1 << log2m;
            double registerSum = 0;
            int zeros = 0;
            for (int v : regs) {
                registerSum += 1.0 / (1 << v);
                if (v == 0) zeros++;
            }
            double alphaMM;
            switch (log2m) {
                case 4: alphaMM = 0.673 * m * m; break;
                case 5: alphaMM = 0.697 * m * m; break;
                case 6: alphaMM = 0.709 * m * m; break;
                default: alphaMM = (0.7213 / (1 + 1.079 / m)) * m * m;
            }
            double estimate = alphaMM / registerSum;
            if (estimate <= (5.0 / 2.0) * m) {
                return Math.round(m * Math.log(m / zeros));
            }
            return Math.round(estimate);
        }

        byte[] getBytes() throws IOException {
            // HyperLogLog.getBytes: writeInt(log2m), writeInt(size*4),
            // then each RegisterSet word big-endian
            int count = 1 << log2m;
            int words = wordsFor(count);
            int[] packed = new int[words];
            for (int i = 0; i < count; i++) {
                int word = i / 6, pos = i % 6;
                packed[word] |= regs[i] << (5 * pos);
            }
            ByteArrayOutputStream bos = new ByteArrayOutputStream();
            DataOutputStream dos = new DataOutputStream(bos);
            dos.writeInt(log2m);
            dos.writeInt(words * 4);
            for (int w : packed) dos.writeInt(w);
            return bos.toByteArray();
        }

        void merge(Hll other) {
            for (int i = 0; i < regs.length; i++)
                if (other.regs[i] > regs[i]) regs[i] = other.regs[i];
        }
    }

    static String hex(byte[] b) {
        StringBuilder sb = new StringBuilder(b.length * 2);
        for (byte x : b) sb.append(String.format("%02x", x));
        return sb.toString();
    }

    static String jstr(String s) {
        return '"' + s.replace("\\", "\\\\").replace("\"", "\\\"") + '"';
    }

    public static void main(String[] args) throws IOException {
        StringBuilder out = new StringBuilder("{\n");

        // --- Java number rendering ground truth (JDK version-sensitive)
        out.append("  \"jdk\": ").append(jstr(System.getProperty("java.version"))).append(",\n");
        long[] doubleBits = new long[64];
        int n = 0;
        double[] seeds = {
            0.0, -0.0, 1.0, -1.0, 0.5, 0.1, 0.2, 0.3, 1.0 / 3.0, 2.0 / 3.0,
            1e-3, 9.999e-4, 1e-4, 9999999.0, 1e7, 1.0000001e7, 123456.789,
            3.141592653589793, 2.718281828459045, 1e23, 1.0e-323, 4.9e-324,
            Double.MAX_VALUE, Double.MIN_NORMAL, 255.0, 1024.5, -67.25,
            7.038531e-26, 1.0E-5, 0.001953125, 678.90123456,
            9.007199254740993e15, 1.7014118346046923e38,
        };
        for (double d : seeds) doubleBits[n++] = Double.doubleToRawLongBits(d);
        // deterministic pseudo-random bit patterns (xorshift), finite only
        long x = 0x9E3779B97F4A7C15L;
        while (n < doubleBits.length) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
            double d = Double.longBitsToDouble(x);
            if (Double.isFinite(d)) doubleBits[n++] = Double.doubleToRawLongBits(d);
        }
        out.append("  \"double_tostring\": [\n");
        for (int i = 0; i < doubleBits.length; i++) {
            double d = Double.longBitsToDouble(doubleBits[i]);
            out.append("    [").append(jstr(String.format("%016x", doubleBits[i])))
               .append(", ").append(jstr(Double.toString(d))).append("]")
               .append(i < doubleBits.length - 1 ? ",\n" : "\n");
        }
        out.append("  ],\n");

        int[] floatBits = new int[48];
        n = 0;
        float[] fseeds = {
            0.0f, -0.0f, 1.0f, 0.5f, 0.1f, 0.2f, 0.3f, 1.0f / 3.0f,
            1e-3f, 1e-4f, 9999999.0f, 1e7f, 3.1415927f, 255.0f, -67.25f,
            Float.MAX_VALUE, Float.MIN_NORMAL, 1.4e-45f, 123456.79f,
        };
        for (float f : fseeds) floatBits[n++] = Float.floatToRawIntBits(f);
        while (n < floatBits.length) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17;
            float f = Float.intBitsToFloat((int) x);
            if (Float.isFinite(f)) floatBits[n++] = Float.floatToRawIntBits(f);
        }
        out.append("  \"float_tostring\": [\n");
        for (int i = 0; i < floatBits.length; i++) {
            float f = Float.intBitsToFloat(floatBits[i]);
            out.append("    [").append(jstr(String.format("%08x", floatBits[i])))
               .append(", ").append(jstr(Float.toString(f))).append("]")
               .append(i < floatBits.length - 1 ? ",\n" : "\n");
        }
        out.append("  ],\n");

        // --- Math.round ground truth (Java floor(x+0.5) semantics)
        out.append("  \"math_round\": [\n");
        double[] rvals = {0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 0.49999999999999994};
        for (int i = 0; i < rvals.length; i++) {
            out.append("    [").append(jstr(Double.toString(rvals[i]))).append(", ")
               .append(Math.round(rvals[i])).append("],\n");
        }
        out.append("    [\"Infinity\", ").append(Math.round(Double.POSITIVE_INFINITY)).append("]\n");
        out.append("  ],\n");

        // --- murmur64 goldens over raw byte strings
        out.append("  \"murmur64\": [\n");
        String[] mins = {"", "a", "abc", "12345678", "123456789", "hello world, murmur!"};
        for (int i = 0; i < mins.length; i++) {
            long h = hash64(mins[i].getBytes(StandardCharsets.UTF_8), 0xe17a1465);
            out.append("    [").append(jstr(mins[i])).append(", ")
               .append(jstr(String.format("%016x", h))).append("]")
               .append(i < mins.length - 1 ? ",\n" : "\n");
        }
        out.append("  ],\n");

        // --- serialized HLL blobs: ints, longs, doubles (via REAL
        // Double.toString), floats, strings; log2m 8 / 12 / 16
        out.append("  \"hll_blobs\": [\n");
        List<String> blobs = new ArrayList<>();
        for (int log2m : new int[] {8, 12, 16}) {
            Hll ints = new Hll(log2m);
            for (int i = 0; i < 500; i++) ints.offer(Integer.valueOf(i * 7 - 250));
            blobs.add(row("ints_x500", log2m, ints));

            Hll longs = new Hll(log2m);
            for (long i = 0; i < 300; i++) longs.offer(Long.valueOf(i * 1_000_000_007L));
            blobs.add(row("longs_x300", log2m, longs));

            Hll doubles = new Hll(log2m);
            for (int i = 0; i < 400; i++) doubles.offer(Double.valueOf(i * 0.37 - 20.0));
            blobs.add(row("doubles_x400", log2m, doubles));

            Hll floats = new Hll(log2m);
            for (int i = 0; i < 400; i++) floats.offer(Float.valueOf(i * 0.37f - 20.0f));
            blobs.add(row("floats_x400", log2m, floats));

            Hll strs = new Hll(log2m);
            for (int i = 0; i < 350; i++) strs.offer("doc-" + i + "-body");
            blobs.add(row("strings_x350", log2m, strs));

            // merged = register max; also exercises re-merge parity
            Hll merged = new Hll(log2m);
            merged.merge(ints);
            merged.merge(strs);
            blobs.add(row("merged_ints_strings", log2m, merged));

            Hll empty = new Hll(log2m);
            blobs.add(row("empty", log2m, empty));
        }
        // the zeros==0 small-range branch: log2m=4 with every register
        // EXACTLY 1 (crafted rank-1 offers) -> registerSum = m/2,
        // estimate = alphaMM/8 = 21.5 <= 2.5m = 40, zeros == 0 ->
        // Math.round(m * log(m / 0.0)) = Long.MAX_VALUE. Random fills
        // overshoot the 2.5m bound (higher ranks shrink registerSum),
        // so inputs are selected by hash.
        Hll sat = new Hll(4);
        List<String> satInputs = new ArrayList<>();
        int i = 0;
        while (satInputs.size() < 16) {
            String s = "zz" + (i++);
            int h = hash32(s.getBytes(StandardCharsets.UTF_8), -1);
            int j = h >>> 28;
            int r = Integer.numberOfLeadingZeros((h << 4) | (1 << 3) + 1) + 1;
            if (r == 1 && sat.regs[j] == 0) {
                sat.offerHashed(h);
                satInputs.add(s);
            }
        }
        blobs.add(row("saturated_log2m4", 4, sat));
        for (int b = 0; b < blobs.size(); b++)
            out.append("    ").append(blobs.get(b)).append(b < blobs.size() - 1 ? ",\n" : "\n");
        out.append("  ],\n  \"saturated_inputs\": [");
        for (int s = 0; s < satInputs.size(); s++)
            out.append(jstr(satInputs.get(s))).append(s < satInputs.size() - 1 ? ", " : "");
        out.append("]\n}");
        System.out.println(out);
    }

    static String row(String name, int log2m, Hll h) throws IOException {
        return "{\"name\": " + jstr(name) + ", \"log2m\": " + log2m
                + ", \"cardinality\": " + h.cardinality()
                + ", \"hex\": " + jstr(hex(h.getBytes())) + "}";
    }
}
