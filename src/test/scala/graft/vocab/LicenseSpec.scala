package graft.vocab

import org.scalatest.funsuite.AnyFunSuite

/** License normalisation, case-for-case from the reference
  * `AttributionTest.scala:61-95` ("licence lookup based on known supplied
  * licences") in /root/reference/src/test/scala/au/org/ala/biocache/. */
class LicenseSpec extends AnyFunSuite {

  private val cases = Seq(
    ("https://creativecommons.org/publicdomain/zero/1.0/legalcode", "CC0"),
    ("http://creativecommons.org/licenses/by-nc/4.0/", "CC-BY-NC 4.0 (Int)"),
    ("http://creativecommons.org/licenses/by/4.0/", "CC-BY 4.0 (Int)"),
    ("https://creativecommons.org/licenses/by/4.0/", "CC-BY 4.0 (Int)"),
    ("https://creativecommons.org/licenses/by/3.0/au/", "CC-BY 3.0 (Au)"),
    ("http://creativecommons.org/licenses/by-nc-sa/4.0/", "CC-BY-NC-SA 4.0 (Int)"),
    ("http://creativecommons.org/licenses/by-nc-nd/4.0/", "CC-BY-NC-ND 4.0 (Int)"),
    ("Attribution-NonCommercial-ShareAlike License", "CC-BY-NC-SA 4.0 (Int)"),
    ("http://creativecommons.org/licenses/cc0/4.0/", "CC0"),
    ("http://creativecommons.org/licenses/by-sa/4.0/", "CC-BY-SA 4.0 (Int)"),
    ("Attribution License", "CC-BY 4.0 (Int)"),
    ("Creative Commons Attribution Non-Commercial Australia 3.0", "CC-BY-NC 3.0 (Au)"),
    ("CCBY 4.0", "CC-BY 4.0 (Int)"),
    ("Attribution-NonCommercial License", "CC-BY-NC 4.0 (Int)"),
    ("Public Domain Mark", "PDM"),
    ("https://creativecommons.org/licenses/by/4.0/legalcode", "CC-BY 4.0 (Int)"),
    ("Attribution-ShareAlike License", "CC-BY-SA 4.0 (Int)"),
    ("© All rights reserved. Image may not be used for any purpose without " +
      "permission from the copyright holder", "Custom"),
    ("CC-BY 3.0(Au)", "CC-BY 3.0 (Au)"),
    ("http://creativecommons.org/licenses/by-nd/4.0/", "CC-BY-ND 4.0 (Int)"),
    ("All Rights Reserved", "Custom"),
    ("Attribution-NonCommercial-NoDerivs License", "CC-BY-NC-ND 4.0 (Int)"),
    ("Attribution-NoDerivs License", "CC-BY-ND 4.0 (Int)"),
    ("CC-BY Au", "CC-BY 4.0 (Au)"))

  for ((raw, expected) <- cases)
    test(s"licence '${raw.take(60)}' -> $expected") {
      assert(License.matchRegex(raw).contains(expected), raw)
    }
}
