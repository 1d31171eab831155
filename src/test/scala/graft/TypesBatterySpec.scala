package graft

import graft.time.TimeFns

/** mods/util/types_test.go battery — the util-type surface the TQL and
  * door layers sit on: the full timezone-abbreviation table
  * (TestTimeZone, types_test.go:500-771), SQL/ANSI timeformat
  * translation incl. 9-digit fractions and the un-padded 12-hour HH
  * (TestTimeFormatter, types_test.go:129-147), FormatEpoch ".str"
  * string-epoch twins (types_test.go:88-127), epoch parse with
  * scientific notation (TestTimeFormat, types_test.go:389), and the
  * ToTime/ToDuration conversion edges (TestConvTime:274-359,
  * TestConvDuration:397-414).
  *
  * Not mirrored: TestSortAn (Go pointer-identity sort — no analogue),
  * TestParseIP/ParseInt (Go strconv plumbing), and the BinaryFormatter
  * table, which CodecBatterySpec already pins through the encoders.
  * One divergence: "-00" resolves to UTC (offset-identical) because
  * Java's tzdb omits the "Factory" zone.
  */
class TypesBatterySpec extends SparkSpec {
  private def err(script: String): String =
    intercept[IllegalArgumentException](runTrim(script)).getMessage

  // types_test.go:42 — ts := time.Unix(0, 1692907084548634123); the
  // µs-aligned twin keeps exact rendering through Spark's µs timestamps
  private val tsUs = 1692907084548634L
  private def strTimeCsv(fmtExpr: String): String = runTrim(
    s"""FAKE( json({ [1] }))
       |MAPVALUE(0, strTime(parseTime($tsUs, 'us'), $fmtExpr))
       |CSV()
       |""".stripMargin).trim

  test("sqlTimeformat 9-digit fractions + trim (TestTimeFormatter types_test.go:129-141)") {
    // ".nnnnnnnnn" and ".mmmuuunnn" both become Go ".999999999": the
    // trailing sub-µs zeros TRIM like Go (548634000 → .548634)
    assert(strTimeCsv("sqlTimeformat('YYYY-MM-DD HH24:MI:SS.nnnnnnnnn'), tz('UTC')")
      == "2023-08-24 19:58:04.548634")
    assert(strTimeCsv("sqlTimeformat('YYYY-MM-DD HH24:MI:SS.mmmuuunnn'), tz('UTC')")
      == "2023-08-24 19:58:04.548634")
    // HH without 24/12 is Go's UN-PADDED 12-hour "3" (types.go:118)
    assert(strTimeCsv("sqlTimeformat('HH:MI'), tz('UTC')") == "7:58")
    assert(strTimeCsv("sqlTimeformat('HH24:MI'), tz('UTC')") == "19:58")
  }

  test("ansiTimeformat fffffffff + 24h hh (TestTimeFormatter types_test.go:144-147)") {
    assert(strTimeCsv("ansiTimeformat('yyyy-mm-dd hh:nn:ss.fffffffff'), tz('UTC')")
      == "2023-08-24 19:58:04.548634")
    // th is the 12-hour token, tm an nn alias
    assert(strTimeCsv("ansiTimeformat('th:tm'), tz('UTC')") == "07:58")
  }

  test("TimeFormatter named formats on the types_test clock (types_test.go:62-86)") {
    assert(strTimeCsv("'DEFAULT', tz('UTC')") == "2023-08-24 19:58:04.548")
    assert(strTimeCsv("'DEFAULT', tz('KST')") == "2023-08-25 04:58:04.548")
    assert(strTimeCsv("'RFC822', tz('KST')") == "25 Aug 23 04:58 KST")
    assert(strTimeCsv("'RFC3339', tz('KST')") == "2023-08-25T04:58:04+09:00")
    assert(strTimeCsv("'RFC3339NANO', tz('KST')")
      == "2023-08-25T04:58:04.548634+09:00")
  }

  test("FormatEpoch .str twins quote the epoch as TEXT (types_test.go:88-127)") {
    def nd(fmt: String): String = runTrim(
      s"""FAKE( json({ [1] }))
         |MAPVALUE(0, parseTime($tsUs, 'us'), 'time')
         |NDJSON( timeformat('$fmt') )
         |""".stripMargin).trim
    assert(nd("ns") == """{"time":1692907084548634000}""")
    assert(nd("ns.str") == """{"time":"1692907084548634000"}""")
    assert(nd("us") == """{"time":1692907084548634}""")
    assert(nd("us.str") == """{"time":"1692907084548634"}""")
    assert(nd("ms") == """{"time":1692907084548}""")
    assert(nd("ms.str") == """{"time":"1692907084548"}""")
    assert(nd("s") == """{"time":1692907084}""")
    assert(nd("s.str") == """{"time":"1692907084"}""")
  }

  test("epoch parse accepts scientific notation (TestTimeFormat types_test.go:389-392)") {
    val out = runTrim(
      """FAKE( json({ ["1.691800174e+09"] }))
        |MAPVALUE(0, parseTime(value(0), 's'))
        |CSV( timeformat('ns') )
        |""".stripMargin).trim
    assert(out == "1691800174000000000")
  }

  test("ToTime now-arithmetic edges (TestConvTime types_test.go:274-330)") {
    // absolute epochs on a pinned clock: a TQL-level subtraction would
    // ride the reference's float64 binary-op semantics and round at 1e18
    val now = 1704871917655327000L
    def at(expr: String): String = runTrim(
      s"""FAKE( json({ [1] }))
         |MAPVALUE(0, timeAdd($expr, '0s'))
         |CSV()
         |""".stripMargin, now).trim
    assert(at("' now '") == now.toString)         // surrounding space trims
    assert(at("'now + 12.5s'") == (now + 12500000000L).toString)
    assert(at("'now - 12.5s'") == (now - 12500000000L).toString)
    assert(at("'now - -12.5s'") == (now + 12500000000L).toString) // doubled sign flips back
    // "now * 2s": not +/- → the plain incompatible-conv error
    assert(err("FAKE( json({ [1] }))\nMAPVALUE(0, time('now * 2s'))\nCSV()\n")
      == "invalid time expression: incompatible conv 'now * 2s' (string) to time.Time")
    // "now - 2?": the duration error rides the conv wrapper
    assert(err("FAKE( json({ [1] }))\nMAPVALUE(0, time('now - 2?'))\nCSV()\n")
      == "invalid time expression: incompatible conv 'now - 2?', time: unknown unit \"?\" in duration \"2?\"")
  }

  test("ToDuration literals (TestConvDuration types_test.go:397-414)") {
    assert(TimeFns.parseDurationNs("1d") == 24L * 3600 * 1000000000L)
    assert(TimeFns.parseDurationNs("-1d2h3m")
      == -1L * (24L * 3600 + 2 * 3600 + 3 * 60) * 1000000000L)
    val e = intercept[IllegalArgumentException](TimeFns.parseDurationNs("wrong"))
    assert(e.getMessage == "time: invalid duration \"wrong\"")
  }

  test("timezone abbreviation table (TestTimeZone types_test.go:500-771, all entries)") {
    for ((abbrev, zone) <- TypesBatterySpec.timezonePins) {
      assert(TimeFns.resolveTz(abbrev) == zone, s"tz $abbrev")
      // and the target must be loadable for formatting
      java.time.ZoneId.of(TimeFns.resolveTz(abbrev))
    }
    // divergence: Java tzdb has no "Factory" — "-00" lands on UTC
    assert(TimeFns.resolveTz("-00") == "UTC")
  }
}

object TypesBatterySpec {
  /** types_test.go:508-771 verbatim (first-loadable zone per alias). */
  val timezonePins: Seq[(String, String)] = Seq(
    ("GHST", "Africa/Accra"), ("HAT", "America/Adak"), ("AET", "Australia/ACT"),
    ("GMT-1", "Etc/GMT+1"), ("COST", "America/Bogota"), ("HKST", "Asia/Hong_Kong"),
    ("RET", "Indian/Reunion"), ("CKT", "Pacific/Rarotonga"), ("ALMT", "Asia/Almaty"),
    ("LHST", "Australia/LHI"), ("GMT-4", "Etc/GMT+4"), ("MDT", "America/Boise"),
    ("BNT", "Asia/Brunei"), ("WIT", "Asia/Jayapura"), ("PKST", "Asia/Karachi"),
    ("GMT-11", "Etc/GMT+11"), ("CAT", "Africa/Blantyre"), ("BRT", "America/Araguaina"),
    ("OMSST", "Asia/Omsk"), ("GMT+5", "Etc/GMT-5"), ("CCT", "Indian/Cocos"),
    ("SST", "Pacific/Midway"), ("AZT", "Asia/Baku"), ("GMT+2", "Etc/GMT-2"),
    ("TKT", "Pacific/Fakaofo"), ("EGT", "America/Scoresbysund"), ("WITA", "Asia/Makassar"),
    ("NOVT", "Asia/Novosibirsk"), ("SAKT", "Asia/Sakhalin"), ("FKT", "Atlantic/Stanley"),
    ("MVT", "Indian/Maldives"), ("CLT", "America/Punta_Arenas"), ("NZT", "Antarctica/McMurdo"),
    ("AQTT", "Asia/Aqtau"), ("PHST", "Asia/Manila"), ("AEST", "Australia/ACT"),
    ("GMT+6", "Etc/GMT-6"), ("TOST", "Pacific/Tongatapu"), ("ACST", "America/Eirunepe"),
    ("AWST", "Antarctica/Casey"), ("TLT", "Asia/Dili"), ("CHAT", "NZ-CHAT"),
    ("WAKT", "Pacific/Wake"), ("DDUT", "Antarctica/DumontDUrville"), ("KRAT", "Asia/Barnaul"),
    ("TMT", "Asia/Ashgabat"), ("HOVT", "Asia/Hovd"), ("PHOT", "Pacific/Enderbury"),
    ("CAST", "Africa/Khartoum"), ("BRST", "America/Araguaina"), ("ECT", "America/Guayaquil"),
    ("AZST", "Asia/Baku"), ("ULAST", "Asia/Ulaanbaatar"), ("EET", "Africa/Cairo"),
    ("AT", "America/Anguilla"), ("IST", "Asia/Calcutta"), ("MMT", "Asia/Rangoon"),
    ("GMT", "Africa/Abidjan"), ("WET", "Africa/Casablanca"), ("ACT", "America/Eirunepe"),
    ("VUT", "Pacific/Efate"), ("PWT", "Pacific/Palau"), ("NT", "America/St_Johns"),
    ("GET", "Asia/Tbilisi"), ("GMT+9", "Etc/GMT-9"), ("MUST", "Indian/Mauritius"),
    ("PET", "America/Lima"), ("SRET", "Asia/Srednekolymsk"), ("ACWT", "Australia/Eucla"),
    ("CKHST", "Pacific/Rarotonga"), ("TOT", "Pacific/Tongatapu"), ("EDT", "America/Detroit"),
    ("TJT", "Asia/Dushanbe"), ("BTT", "Asia/Thimbu"), ("LHDT", "Australia/LHI"),
    ("VUST", "Pacific/Efate"), ("NCT", "Pacific/Noumea"), ("PONT", "Pacific/Pohnpei"),
    ("KGT", "Asia/Bishkek"), ("BORTST", "Asia/Kuching"), ("MAGT", "Asia/Magadan"),
    ("SCT", "Indian/Mahe"), ("MLAST", "Asia/Kuala_Lumpur"), ("YEKST", "Asia/Yekaterinburg"),
    ("ACWST", "Australia/Eucla"), ("AWT", "Antarctica/Casey"), ("KST", "Asia/Seoul"),
    ("MALST", "Asia/Singapore"), ("IRST", "Asia/Tehran"), ("LHT", "Australia/LHI"),
    ("ART", "America/Argentina/Buenos_Aires"), ("AFT", "Asia/Kabul"), ("QYZST", "Asia/Qyzylorda"),
    ("UYT", "America/Montevideo"), ("GMT-10", "Etc/GMT+10"), ("VOLT", "Europe/Volgograd"),
    ("ARST", "America/Argentina/Buenos_Aires"), ("ADT", "America/Barbados"), ("VLAT", "Asia/Ust-Nera"),
    ("MSK", "Europe/Kirov"), ("WSDT", "Pacific/Apia"), ("ChST", "Pacific/Guam"),
    ("EEST", "Africa/Cairo"), ("CVT", "Atlantic/Cape_Verde"), ("GMT+13", "Etc/GMT-13"),
    ("GMT+8", "Etc/GMT-8"), ("SAMT", "Europe/Astrakhan"), ("GMT+04:00", "Europe/Saratov"),
    ("ACWDT", "Australia/Eucla"), ("FNST", "America/Noronha"), ("CHOT", "Asia/Choibalsan"),
    ("HOVST", "Asia/Hovd"), ("PKT", "Asia/Karachi"), ("OMST", "Asia/Omsk"),
    ("QYZT", "Asia/Qyzylorda"), ("YEKT", "Asia/Yekaterinburg"), ("SAST", "Africa/Johannesburg"),
    ("PEST", "America/Lima"), ("GMT-3", "Etc/GMT+3"), ("AMST", "America/Boa_Vista"),
    ("MAWT", "Antarctica/Mawson"), ("GMT-12", "Etc/GMT+12"), ("GMT+7", "Etc/GMT-7"),
    ("MUT", "Indian/Mauritius"), ("PYT", "America/Asuncion"), ("BST", "America/La_Paz"),
    ("BDT", "Asia/Dacca"), ("GMT+4", "Etc/GMT-4"), ("HADT", "America/Adak"),
    ("NZST", "Antarctica/McMurdo"), ("VOST", "Antarctica/Vostok"), ("ICT", "Asia/Bangkok"),
    ("YAKT", "Asia/Chita"), ("AWDT", "Australia/Perth"), ("EASST", "Chile/EasterIsland"),
    ("ALMST", "Asia/Almaty"), ("UZST", "Asia/Samarkand"), ("WST", "Pacific/Apia"),
    ("VET", "America/Caracas"), ("MSD", "Europe/Kirov"), ("WAT", "Africa/Bangui"),
    ("ET", "America/Atikokan"), ("EHDT", "America/Santo_Domingo"), ("EAST", "Chile/EasterIsland"),
    ("GMT+11", "Etc/GMT-11"), ("GMT+12", "Etc/GMT-12"), ("BOT", "America/La_Paz"),
    ("BDST", "Asia/Dacca"), ("ULAT", "Asia/Ulaanbaatar"), ("UTC", "UTC"),
    ("GMT+1", "Etc/GMT-1"), ("AST", "America/Anguilla"), ("AQTST", "Asia/Aqtobe"),
    ("HKT", "Asia/Hong_Kong"), ("JDT", "Asia/Tokyo"), ("AZOST", "Atlantic/Azores"),
    ("IOT", "Indian/Chagos"), ("TAHT", "Pacific/Tahiti"), ("HAST", "America/Adak"),
    ("CST", "America/Bahia_Banderas"), ("NDT", "America/St_Johns"), ("UZT", "Asia/Samarkand"),
    ("CHADT", "NZ-CHAT"), ("EGST", "America/Scoresbysund"), ("GST", "Asia/Dubai"),
    ("GMT-6", "Etc/GMT+6"), ("FJST", "Pacific/Fiji"), ("KOST", "Pacific/Kosrae"),
    ("COT", "America/Bogota"), ("IRT", "Iran"), ("MET", "MET"),
    ("CHUT", "Pacific/Chuuk"), ("UYST", "America/Montevideo"), ("CLST", "America/Santiago"),
    ("MIST", "Antarctica/Macquarie"), ("KRAST", "Asia/Krasnoyarsk"), ("AZOT", "Atlantic/Azores"),
    ("GMT-5", "Etc/GMT+5"), ("TFT", "Indian/Kerguelen"), ("EAT", "Africa/Addis_Ababa"),
    ("CHOST", "Asia/Choibalsan"), ("NPT", "Asia/Kathmandu"), ("CT", "America/Bahia_Banderas"),
    ("SYOT", "Antarctica/Syowa"), ("IDT", "Asia/Jerusalem"), ("GMT+3", "Etc/GMT-3"),
    ("EST", "America/Atikokan"), ("SRT", "America/Paramaribo"), ("NST", "America/St_Johns"),
    ("GMT+10", "Etc/GMT-10"), ("MEST", "MET"), ("AEDT", "Australia/ACT"),
    ("NFT", "Pacific/Norfolk"), ("IRKT", "Asia/Irkutsk"), ("PHT", "Asia/Manila"),
    ("KDT", "Asia/Seoul"), ("NRT", "Pacific/Nauru"), ("CEST", "Africa/Ceuta"),
    ("PT", "America/Dawson"), ("CHAST", "NZ-CHAT"), ("MART", "Pacific/Marquesas"),
    ("NCST", "Pacific/Noumea"), ("MT", "America/Boise"), ("PMDT", "America/Miquelon"),
    ("ACDT", "Australia/Adelaide"), ("LINT", "Pacific/Kiritimati"), ("IRKST", "Asia/Irkutsk"),
    ("GDT", "Pacific/Guam"), ("CET", "Africa/Algiers"), ("WGT", "America/Godthab"),
    ("TRT", "Asia/Istanbul"), ("WEST", "Africa/Casablanca"), ("AKST", "America/Anchorage"),
    ("ORAT", "Asia/Oral"), ("GMT+14", "Etc/GMT-14"), ("GFT", "America/Cayenne"),
    ("PST", "America/Dawson"), ("PDT", "America/Ensenada"), ("DAVT", "Antarctica/Davis"),
    ("YAKST", "Asia/Chita"), ("GMT-8", "Etc/GMT+8"), ("WFT", "Pacific/Wallis"),
    ("PYST", "America/Asuncion"), ("MST", "America/Boise"), ("NZDT", "Antarctica/McMurdo"),
    ("GILT", "Pacific/Tarawa"), ("AKT", "America/Anchorage"), ("GYT", "America/Guyana"),
    ("GMT-2", "Etc/GMT+2"), ("CXT", "Indian/Christmas"), ("SBT", "Pacific/Guadalcanal"),
    ("NFDT", "Pacific/Norfolk"), ("PGT", "Pacific/Port_Moresby"), ("VLAST", "Asia/Ust-Nera"),
    ("MHT", "Kwajalein"), ("TVT", "Pacific/Funafuti"), ("AMT", "America/Boa_Vista"),
    ("ANAT", "Asia/Anadyr"), ("TSD", "Asia/Dushanbe"), ("PETT", "Asia/Kamchatka"),
    ("SGT", "Asia/Singapore"), ("FJT", "Pacific/Fiji"), ("WIB", "Asia/Jakarta"),
    ("KT", "Asia/Seoul"), ("JST", "Asia/Tokyo"), ("GAMT", "Pacific/Gambier"),
    ("PMST", "America/Miquelon"), ("MAGST", "Asia/Magadan"), ("IRDT", "Asia/Tehran"),
    ("GMT-7", "Etc/GMT+7"), ("AKDT", "America/Anchorage"), ("NUT", "Pacific/Niue"),
    ("CDT", "America/Bahia_Banderas"), ("WGST", "America/Godthab"), ("FNT", "America/Noronha"),
    ("ROTT", "Antarctica/Palmer"), ("MYT", "Asia/Kuala_Lumpur"), ("GALT", "Pacific/Galapagos"),
    ("GMT-9", "Etc/GMT+9"))
}
