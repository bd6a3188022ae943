import com.clearspring.analytics.hash.MurmurHash;
import org.apache.datasketches.hash.MurmurHash3;
import org.apache.datasketches.thetacommon.ThetaUtil;
import java.nio.charset.StandardCharsets;

public class Probe {
    public static void main(String[] a) {
        // clearspring object-hash dispatch
        System.out.println("cs int 5:      " + Long.toHexString(MurmurHash.hash64(Integer.valueOf(5))));
        System.out.println("cs str '5':    " + Long.toHexString(MurmurHash.hash64("5")));
        System.out.println("cs long 5:     " + Long.toHexString(MurmurHash.hash64(Long.valueOf(5))));
        System.out.println("cs dbl 1.5:    " + Long.toHexString(MurmurHash.hash64(Double.valueOf(1.5))));
        System.out.println("cs str '1.5':  " + Long.toHexString(MurmurHash.hash64("1.5")));
        System.out.println("cs flt 1.5f:   " + Long.toHexString(MurmurHash.hash64(Float.valueOf(1.5f))));
        System.out.println("cs bytes '5':  " + Long.toHexString(MurmurHash.hash64("5".getBytes(StandardCharsets.UTF_8))));
        // datasketches murmur3 + seed hash
        long[] h = MurmurHash3.hash(new long[]{7L}, 9001L);
        System.out.println("ds hash(long[]{7},9001)[0]: " + Long.toHexString(h[0]) + " h0>>>1: " + Long.toHexString(h[0] >>> 1));
        byte[] b7 = new byte[]{7,0,0,0,0,0,0,0};
        long[] hb = MurmurHash3.hash(b7, 9001L);
        System.out.println("ds hash(bytes LE 7,9001)[0]: " + Long.toHexString(hb[0]));
        System.out.println("ds seedhash(9001): " + Integer.toHexString(ThetaUtil.computeSeedHash(9001L)));
        long[] s = MurmurHash3.hash("a".getBytes(StandardCharsets.UTF_8), 9001L);
        System.out.println("ds hash('a')[0]>>>1: " + Long.toHexString(s[0] >>> 1));
    }
}
