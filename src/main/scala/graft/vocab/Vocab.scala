package graft.vocab

import java.util.Locale

/** Vocabulary normalisation: variant term → canonical term.
  *
  * Mirrors the reference vocab system (`vocab/Vocab.scala:50-101` plus the
  * txt variant tables under src/main/resources in /root/reference): match is
  * case-insensitive on the alphanumeric-only form of the term. Each vocab
  * below carries a curated variant subset of the reference tables (the
  * matching semantics, not the full data dump, are the contract).
  */
trait Vocab extends Serializable {
  def variants: Map[String, String] // normalised variant -> canonical

  protected def norm(s: String): String =
    s.toLowerCase(Locale.ROOT).replaceAll("[^a-z0-9]", "")

  def matchTerm(raw: String): Option[String] = {
    if (raw == null) return None
    val n = norm(raw)
    if (n.isEmpty) None else variants.get(n)
  }

  protected def build(pairs: (String, Seq[String])*): Map[String, String] =
    pairs.flatMap { case (canonical, vs) =>
      (canonical +: vs).map(v => norm(v) -> canonical)
    }.toMap
}

/** Darwin Core basisOfRecord (reference `basisOfRecord.txt`). */
object BasisOfRecord extends Vocab {
  val variants: Map[String, String] = build(
    "PreservedSpecimen" -> Seq("specimen", "voucher", "sheet", "s", "sp",
      "spec", "herbarium specimen", "museum specimen", "preserved",
      "preserved specimen", "dried specimen", "collection", "accession"),
    "HumanObservation" -> Seq("observation", "obs", "o", "sight", "sighting",
      "human observation", "photo", "photograph", "field survey",
      "live observation", "still image", "audio recording"),
    "MachineObservation" -> Seq("machine", "machine observation"),
    "FossilSpecimen" -> Seq("fossil", "f", "fos", "fossil record",
      "specimen, fossil"),
    "LivingSpecimen" -> Seq("living", "l", "zoo", "living organism",
      "live plant collection"),
    "MaterialSample" -> Seq("material sample"),
    "EnvironmentalDNA" -> Seq("edna", "environmental dna"),
    "GenomicDNA" -> Seq("genomic dna"),
    "Literature" -> Seq("literature", "publication", "published report",
      "checklist record", "literature record"),
    "Image" -> Seq("i", "img", "jpg", "png"),
    "Sound" -> Seq("snd", "wav", "track"),
    "Video" -> Seq("mov", "mp4", "mpg", "avi", "v", "vid"))
}

/** occurrenceStatus (reference `occurrenceStatus.txt`). */
object OccurrenceStatus extends Vocab {
  val variants: Map[String, String] = build(
    "present" -> Seq("pres", "presence", "p", "common", "irregular", "rare"),
    "absent" -> Seq("abs", "absence", "a"))
}

/** typeStatus subset (reference `typeStatus.txt`). */
object TypeStatus extends Vocab {
  val variants: Map[String, String] = build(
    "holotype" -> Seq("holo", "holotipo"),
    "paratype" -> Seq("para", "paratipo"),
    "syntype" -> Seq("syn"),
    "lectotype" -> Seq("lecto"),
    "neotype" -> Seq("neo"),
    "isotype" -> Seq("iso"),
    "topotype" -> Seq("topo"),
    "allotype" -> Seq("allo"),
    "notatype" -> Seq("not a type", "nonType"))
}

/** sex (reference `sex.txt`). */
object Sex extends Vocab {
  val variants: Map[String, String] = build(
    "Male" -> Seq("m", "males"),
    "Female" -> Seq("f", "females"),
    "Hermaphrodite" -> Seq("herm"),
    "Indeterminate" -> Seq("indet", "unknown", "und", "undetermined"))
}

/** Habitat → biome grouping (reference `vocab/HabitatMap.scala`). */
object Habitat extends Vocab {
  val variants: Map[String, String] = build(
    "Terrestrial" -> Seq("land", "terrestre"),
    "Marine" -> Seq("sea", "ocean", "coastal", "estuarine"),
    "Limnetic" -> Seq("freshwater", "fresh water", "aquatic"))
}
