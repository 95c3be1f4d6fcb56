package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.sources.Hdf5Classic
import graft.sources.NetcdfClassic.{NcAttr, NcDim}

/** Property tests for the HDF5 writer↔parser pair: write→parse→read
  * must be the identity over the whole supported grid space — any dim
  * sizes (incl. 1, which collapses padding edge cases), any IEEE
  * doubles (incl. negatives, subnormal-adjacent magnitudes, ±0), any
  * attr names/lengths (which move every section's 8-byte padding), and
  * any variable-name set (which permutes the SNOD sort order and heap
  * offsets). The fixed golden fixtures in Hdf5Spec check absolute byte
  * offsets against the spec; these check the algebra. */
object Hdf5Properties extends Properties("Hdf5Classic") {

  private val nameGen =
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val gridGen = for {
    nt <- Gen.choose(1, 4)
    nlat <- Gen.choose(1, 3)
    nlon <- Gen.choose(1, 5)
    varName <- nameGen.suchThat(n => !Set("time", "lat", "lon")(n))
    attrName <- nameGen
    attrVal <- Gen.choose(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    data <- Gen.containerOfN[Array, Double](nt * nlat * nlon,
      Gen.oneOf(Gen.choose(-1e12, 1e12), Gen.oneOf(0.0, -0.0, 1.5e-300, -7.25)))
  } yield (nt, nlat, nlon, varName, attrName, attrVal, data)

  property("write→parse→read is identity over dims, names, attrs, values") =
    forAll(gridGen) { case (nt, nlat, nlon, v, an, av, data) =>
      val bytes = Hdf5Classic.write(
        dims = Seq(NcDim("time", nt), NcDim("lat", nlat), NcDim("lon", nlon)),
        vars = Seq(
          ("time", Seq(0), Seq(NcAttr(an, av)), Array.tabulate(nt)(_.toDouble)),
          ("lat", Seq(1), Nil, Array.tabulate(nlat)(_ * 10.0)),
          ("lon", Seq(2), Nil, Array.tabulate(nlon)(_ * 10.0)),
          (v, Seq(0, 1, 2), Seq(NcAttr("units", "K")), data)))
      val h5 = Hdf5Classic.parse(bytes)
      h5.read(v).toSeq == data.toSeq &&
        h5.dimNames(v) == Seq("time", "lat", "lon") &&
        h5.variable("time").attrStr(an).contains(av) &&
        h5.variable(v).attrStr("units").contains("K") &&
        h5.read("lat").toSeq == Seq.tabulate(nlat)(_ * 10.0)
    }

  private val slabGen = for {
    g <- gridGen
    (nt, nlat, nlon, _, _, _, _) = g
    t0 <- Gen.choose(0, nt - 1)
    ct <- Gen.choose(0, nt - t0)
    a0 <- Gen.choose(0, nlat - 1)
    ca <- Gen.choose(0, nlat - a0)
    o0 <- Gen.choose(0, nlon - 1)
    co <- Gen.choose(0, nlon - o0)
  } yield (g, (t0, ct, a0, ca, o0, co))

  property("readSlab == read-then-slice over random 3-D grids and rectangles (r13)") =
    forAll(slabGen) { case ((nt, nlat, nlon, v, an, av, data), (t0, ct, a0, ca, o0, co)) =>
      val bytes = Hdf5Classic.write(
        dims = Seq(NcDim("time", nt), NcDim("lat", nlat), NcDim("lon", nlon)),
        vars = Seq(
          ("time", Seq(0), Seq(NcAttr(an, av)), Array.tabulate(nt)(_.toDouble)),
          ("lat", Seq(1), Nil, Array.tabulate(nlat)(_ * 10.0)),
          ("lon", Seq(2), Nil, Array.tabulate(nlon)(_ * 10.0)),
          (v, Seq(0, 1, 2), Seq(NcAttr("units", "K")), data)))
      val h5 = Hdf5Classic.parse(bytes)
      val slab = h5.readSlab(v, Seq(t0.toLong, a0.toLong, o0.toLong),
        Seq(ct.toLong, ca.toLong, co.toLong))
      val expect = for {
        t <- t0 until t0 + ct
        a <- a0 until a0 + ca
        o <- o0 until o0 + co
      } yield data((t * nlat + a) * nlon + o)
      // toSeq comparison of boxed doubles: use java equality on bits so
      // -0.0 vs 0.0 and NaN slots compare the way the reader emits them
      slab.length == expect.length &&
        slab.toSeq.zip(expect).forall { case (x, y) =>
          java.lang.Double.doubleToLongBits(x) ==
            java.lang.Double.doubleToLongBits(y)
        }
    }

  private val corruptionGen = for {
    pos <- Gen.choose(0, 700)   // the whole structural region of the
    v <- Gen.choose(0, 255)     // fixed grid file written below
  } yield (pos, v.toByte)

  property("single-byte corruption always TERMINATES: parse+read throw or succeed") =
    forAll(corruptionGen) { case (pos, v) =>
      // totality over corrupt input: at ingest scale one bad file must
      // fail loudly, never hang, spin, or overflow the stack. (Silent
      // value changes are expected when the flipped byte is data — the
      // property is termination, plus the depth/continuation guards.)
      val good = Hdf5Classic.write(
        dims = Seq(NcDim("time", 2), NcDim("lat", 2), NcDim("lon", 2)),
        vars = Seq(
          ("time", Seq(0), Seq(NcAttr("units", "days since 2000-01-01")),
            Array(0.0, 1.0)),
          ("lat", Seq(1), Nil, Array(0.0, 10.0)),
          ("lon", Seq(2), Nil, Array(0.0, 10.0)),
          ("tas", Seq(0, 1, 2), Nil, Array.tabulate(8)(_.toDouble))))
      val bad = good.clone(); bad(pos % good.length) = v
      try {
        val f = Hdf5Classic.parse(bad)
        f.vars.foreach(x => f.read(x.name))
        true
      } catch { case _: Exception | _: StackOverflowError => true }
    }

  private val multiVarGen = for {
    n <- Gen.choose(1, 6)
    names <- Gen.listOfN(n, nameGen).map(_.distinct)
      .suchThat(ns => ns.nonEmpty && !ns.contains("x"))
    len <- Gen.choose(1, 7)
  } yield (names, len)

  property("SNOD name ordering holds for any variable-name set") =
    forAll(multiVarGen) { case (names, len) =>
      // all vars share one dim "x"; names arrive unsorted, the writer
      // must sort the symbol table, and lookups must still resolve
      val vars = ("x", Seq(0), Seq.empty[NcAttr],
        Array.tabulate(len)(_.toDouble)) +:
        names.map(n => (n, Seq(0), Seq.empty[NcAttr],
          Array.tabulate(len)(i => (n.hashCode % 97) + i.toDouble)))
      val h5 = Hdf5Classic.parse(Hdf5Classic.write(Seq(NcDim("x", len)), vars))
      names.forall { n =>
        h5.read(n).toSeq == Seq.tabulate(len)(i => (n.hashCode % 97) + i.toDouble) &&
          h5.dimNames(n) == Seq("x")
      }
    }
}
